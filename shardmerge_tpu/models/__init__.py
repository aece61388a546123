from .llama import ModelConfig, init_params, forward, init_kv_cache  # noqa: F401
