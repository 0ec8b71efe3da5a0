from nvit_tpu.debug.cli import debug_model, fixture_image

__all__ = ["debug_model", "fixture_image"]
