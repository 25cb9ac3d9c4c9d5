from v1t_tpu.analysis.attention_rollout import (
    attention_rollout,
    attention_rollouts,
    extract_attention_maps,
)

__all__ = ["attention_rollout", "attention_rollouts", "extract_attention_maps"]
