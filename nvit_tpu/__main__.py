"""Package entry point: ``python -m nvit_tpu``.

≙ reference ``torchrun … nvit/train.py`` → main() (train.py:1203-1212).  No
launcher daemon is needed on TPU: a single process drives all local devices
via SPMD; multi-host runs call ``jax.distributed.initialize()`` first (one
process per host, same command on every host).
"""

from nvit_tpu.train.trainer import main

if __name__ == "__main__":
    main()
