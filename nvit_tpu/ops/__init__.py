from nvit_tpu.ops.attention import attention, sdpa_xla

__all__ = ["attention", "sdpa_xla"]
