# Root conftest: force the test suite onto a virtual 8-device CPU mesh.
#
# The machine's sitecustomize pins JAX_PLATFORMS=axon (a single tunneled TPU
# chip) and imports jax at interpreter startup, so the backend cannot be
# switched in-process. We therefore re-exec pytest once with a scrubbed
# environment: CPU platform, 8 virtual devices (to exercise Mesh/pjit
# sharding), and no axon site path.
#
# Set VCT_TEST_TPU=1 to skip the re-exec and run the suite on the real chip.
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from vct.utils.cpumesh import apply_rendezvous_grace_inplace  # noqa: E402
from vct.utils.hostcache import machine_cache_dir  # noqa: E402


def _needs_cpu_reexec() -> bool:
    if (
        os.environ.get("VCT_TEST_REEXEC") == "1"
        or os.environ.get("VCT_TEST_TPU") == "1"
    ):
        return False
    if os.environ.get("JAX_PLATFORMS", "axon") != "cpu":
        return True
    # The env CLAIMS cpu — but this machine's sitecustomize force-registers
    # the TPU backend regardless of JAX_PLATFORMS, so `JAX_PLATFORMS=cpu
    # pytest tests/foo.py` would silently run on the chip (where default
    # conv precision is bf16-class and mesh tests see one device). Trust
    # the actual backend, not the env var; the re-exec child's scrubbed
    # PYTHONPATH drops the sitecustomize so it really lands on CPU.
    import jax

    return jax.default_backend() != "cpu"


def pytest_configure(config):
    if not _needs_cpu_reexec():
        if os.environ.get("VCT_TEST_TPU") != "1":
            # The DEFAULT conv/matmul precision of whatever backend ends up
            # active is bf16-class on the TPU MXU (measured ~3e-3 relative
            # on a single stem conv) and backend/host-dependent on CPU —
            # enough to drown the 1e-3/1e-4 tolerances of the torch-golden
            # and algebraic-identity tests. This lane checks algebra, not
            # backend rounding, so pin true f32. It also keeps the suite
            # honest if env leakage lands it on a non-CPU backend (this
            # machine's sitecustomize force-registers the TPU regardless of
            # JAX_PLATFORMS — only the re-exec's scrubbed PYTHONPATH drops
            # it). The VCT_TEST_TPU=1 lane keeps the production default:
            # its tolerances are part of what the suite validates on
            # hardware.
            import jax

            jax.config.update("jax_default_matmul_precision", "float32")
        return
    import subprocess

    env = dict(os.environ)
    env["VCT_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    # Drop the axon sitecustomize, keep the repo importable.
    env["PYTHONPATH"] = _REPO_ROOT
    xla = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla:
        env["XLA_FLAGS"] = (xla + " --xla_force_host_platform_device_count=8").strip()
    # Extended collective rendezvous grace + single-threaded math libraries:
    # 8 virtual devices time-slice one core here, and the default 40 s abort
    # fires under load (observed rc=-6 in round 2).
    apply_rendezvous_grace_inplace(env)
    # Persistent XLA compile cache: most suite time is CPU compiles of the
    # same tiny models; repeat runs hit the cache.
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", machine_cache_dir("/tmp/vct_jax_test_cache")
    )
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    argv = list(sys.orig_argv)
    argv[0] = sys.executable

    # pytest has already taken over fds 1/2 for capture; hand them back so
    # the child's live output reaches the terminal.
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    rc = subprocess.run(argv, env=env).returncode
    # Exit with the child's code; os._exit skips pytest's own shutdown.
    os._exit(rc)
