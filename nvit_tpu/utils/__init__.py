"""Runtime utilities that are not model, data, or training logic."""

from nvit_tpu.utils.device_lock import acquire_tpu_lock

__all__ = ["acquire_tpu_lock"]
