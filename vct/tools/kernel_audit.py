"""On-chip Pallas kernel parity audit.

The kernel goldens in ``tests/test_pallas_ops.py`` run in interpret mode on
the CPU lane; Mosaic's real lowering can differ (round 5 caught an XLA:TPU
miscompile — a reshape feeding a feature-grouped conv inside one jit — and
a bf16-reference subtlety this way; see docs/performance.md "XLA:TPU
correctness/precision findings"). This tool re-proves COMPILED parity on
the real chip for the three scoring kernels across both layouts and the
awkward geometries (sub-vreg lane widths, odd H, C=1, chunk-boundary L),
against f32-precision XLA references (on TPU the XLA conv default is
bf16-class — comparing an exact kernel against it at 2e-6 would "fail" on
reference error).

Run:  PYTHONPATH="/root/.axon_site:/root/repo" python -m vct.tools.kernel_audit
Exits non-zero on any mismatch; prints one OK line per case.
"""

from __future__ import annotations

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from vct.utils.compilecache import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    from vct.data.preprocess import device_sample_clips
    from vct.data.samplers import (
        _device_ssim,
        device_frame_scores,
        device_topk_indices,
    )
    from vct.ops import pair_scores_pallas, ssim_pallas

    rng = np.random.RandomState(0)
    shapes = [
        (2, 12, 16, 16, 3),  # W*C=48: sub-vreg lane width
        (1, 9, 11, 44, 3),   # W*C=132, odd H
        (2, 10, 8, 48, 3),   # W*C=144
        (1, 7, 9, 86, 3),    # W*C=258, odd H
        (2, 21, 16, 48, 1),  # C=1; L crosses the chunk boundary
        (2, 20, 80, 80, 3),  # the bench frame geometry
    ]

    def want_ssim(clips):
        with jax.default_matmul_precision("float32"):
            return np.stack([
                np.asarray(_device_ssim(
                    jnp.asarray(c[:-1], jnp.float32),
                    jnp.asarray(c[1:], jnp.float32),
                ))
                for c in clips
            ])

    def want_pair(clips, m):
        with jax.default_matmul_precision("float32"):
            return np.stack([
                np.asarray(device_frame_scores(jnp.asarray(c), m))
                for c in clips
            ])

    default = ssim_pallas._CLIP_VMEM_BYTES
    try:
        for budget in (default, 0):  # chunked layout, then forced fallback
            ssim_pallas._CLIP_VMEM_BYTES = budget
            pair_scores_pallas._CLIP_VMEM_BYTES = budget
            ssim_pallas.ssim_pair_scores.clear_cache()
            pair_scores_pallas.pair_scores.clear_cache()
            for shape in shapes:
                clips = rng.randint(0, 256, shape, np.uint8)
                got = np.asarray(
                    ssim_pallas.ssim_pair_scores(jnp.asarray(clips))
                )
                np.testing.assert_allclose(
                    got, want_ssim(clips), atol=3e-6,
                    err_msg=f"ssim {shape} budget={budget}",
                )
                for m in ("sad", "flow"):
                    got = np.asarray(
                        pair_scores_pallas.pair_scores(jnp.asarray(clips), m)
                    )
                    w = want_pair(clips, m)
                    if m == "sad":
                        np.testing.assert_array_equal(
                            got, w, err_msg=f"sad {shape} budget={budget}"
                        )
                    else:
                        np.testing.assert_allclose(
                            got, w, rtol=1e-6,
                            err_msg=f"flow {shape} budget={budget}",
                        )
                print(f"OK {shape} budget={budget}", flush=True)
    finally:
        ssim_pallas._CLIP_VMEM_BYTES = default
        pair_scores_pallas._CLIP_VMEM_BYTES = default

    # The barrier'd float-frame ssim path of device_sample_clips — the one
    # that MISCOMPILED (uniform ~0.75 scores) before optimization_barrier.
    clips = rng.randint(0, 256, (2, 12, 16, 16, 3), np.uint8)
    rawf = jnp.asarray(clips, jnp.float32) / 255.0
    got = np.asarray(device_sample_clips(rawf, 4, method="ssim"))
    with jax.default_matmul_precision("float32"):
        scores = 1.0 - np.stack([
            np.asarray(_device_ssim(rawf[i, :-1], rawf[i, 1:]))
            for i in range(2)
        ])
        idx = np.stack([
            np.asarray(device_topk_indices(jnp.asarray(s), 4, "canonical"))
            for s in scores
        ])
    sel = np.take_along_axis(
        np.asarray(rawf), idx[:, :, None, None, None], 1
    ) / 255.0
    np.testing.assert_allclose(got, sel, atol=1e-5)
    print("OK float-frame ssim path (optimization_barrier regression)")
    print("kernel audit: ALL ON-CHIP PARITY OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
