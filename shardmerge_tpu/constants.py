"""Sentinel layer indices.

Parity: reference shard/constants.py:4-5.
"""

INPUT_LAYER = -1
OUTPUT_LAYER = -2

# The standard per-layer projection names LoRA tooling targets by default
# (parallel/lora.py training, tools/extract_lora.py extraction, examples).
# ONE definition: a list drifting out of sync would silently train/extract
# adapters over different tensor sets.
LORA_TARGET_PROJECTIONS = (
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
)
