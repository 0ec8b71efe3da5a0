"""Package entry point: ``python -m nvit_tpu``.

≙ reference ``torchrun … nvit/train.py`` → main() (train.py:1203-1212).  No
launcher daemon is needed on TPU: a single process drives all local devices
via SPMD; multi-host runs call ``jax.distributed.initialize()`` first (one
process per host, same command on every host).
"""

import os

from nvit_tpu.train.trainer import main


def cli() -> None:
    """Console-script entry (`nvit-train`) and ``python -m nvit_tpu`` body.

    Multi-host SPMD: set NVIT_MULTIHOST=1 (plus the standard JAX coordinator
    env: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    a TPU-pod metadata environment where initialize() needs no args).
    ≙ the reference's torchrun rendezvous (RANK/WORLD_SIZE/MASTER_*).
    """
    if os.environ.get("NVIT_MULTIHOST") == "1":
        import jax

        # initialize() only auto-detects managed clusters (TPU pod metadata,
        # SLURM, OMPI); on a plain host pass the coordinator env explicitly.
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                process_id=int(os.environ["JAX_PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()
    main()


if __name__ == "__main__":
    cli()
