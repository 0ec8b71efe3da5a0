"""nvit_tpu — a TPU-native (JAX / XLA / Pallas) rebuild of the nViT training stack.

Capability-equivalent to the PyTorch reference (slobodaapl/nvit): a dual-stream
Vision Transformer classifier with an optional nGPT-style *normalized* mode
(unit-hypersphere representations, SLERP residuals, learned s_qk/s_uv/s_z
scalings, per-step weight renormalization) and an optional Kohonen
self-organizing-map regularizer, plus the surrounding trainer: config/profile
system, CIFAR/ImageNet data pipeline with AutoAugment, data-parallel SPMD
training over a device mesh, bf16 policy, checkpoint/resume, observability,
early stopping, and a debug CLI.

The design is idiomatic JAX, not a port: pure-functional model/apply functions
over explicit parameter pytrees, a single jitted train step (forward, loss,
grad, optimizer update, weight renorm, SOM Hebbian update all inside one
`jit`/`shard_map`), explicit PRNG threading, and Pallas kernels for the hot
ops (fused nViT attention, fused weight renorm).
"""

__version__ = "0.1.0"
