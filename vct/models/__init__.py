from vct.core.registry import Registry
from vct.models.lrcn import LRCN, build_lrcn  # noqa: F401
from vct.models.scratch_cnn import LRCN2, TimeDistributedCNNLSTM  # noqa: F401
from vct.models.videomamba import VideoMamba, build_videomamba  # noqa: F401

MODEL_FAMILIES = Registry("model_family")
MODEL_FAMILIES.register("lrcn", build_lrcn)
MODEL_FAMILIES.register("videomamba", build_videomamba)


def build_model(model_cfg, sequence_length: int):
    """Build the configured model family (cfg.model_family dispatch)."""
    if model_cfg.model_family in MODEL_FAMILIES:
        return MODEL_FAMILIES.get(model_cfg.model_family)(model_cfg, sequence_length)
    if model_cfg.model_family == "lrcn2":
        return LRCN2(
            num_classes=model_cfg.num_classes,
            sequence_length=sequence_length,
            hidden_size=model_cfg.resolved_hidden_size,
        )
    if model_cfg.model_family == "td_cnn_lstm":
        return TimeDistributedCNNLSTM(num_classes=model_cfg.num_classes)
    raise KeyError(f"Unknown model family: {model_cfg.model_family}")
