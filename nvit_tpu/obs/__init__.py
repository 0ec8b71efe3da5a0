from nvit_tpu.obs.metrics import (
    MetricsWriter,
    StepTimer,
    hparams_str,
    memory_stats,
    setup_logging,
    write_stat_line,
)

__all__ = [
    "MetricsWriter",
    "StepTimer",
    "hparams_str",
    "memory_stats",
    "setup_logging",
    "write_stat_line",
]
