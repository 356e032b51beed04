"""imgadapointr_tpu: a TPU-native (JAX/XLA/Pallas) point-cloud completion framework.

Re-implements the full capability surface of the reference PyTorch/CUDA framework
(mmkuznecov/ImgAdaPoinTr) with a TPU-first design:

- ``ops``:      pure-functional geometry kernels (kNN, FPS, Chamfer, EMD, gridding, ...)
                with custom VJPs; Pallas kernels for the hot paths, XLA everywhere else.
- ``nn``:       transformer / point-cloud primitives as flax.linen modules.
- ``models``:   the registered model zoo (AdaPoinTr, ImgAdaPoinTr, Seg variants,
                FoldingNet, PCN, TopNet, GRNet, SnowFlakeNet, GDANet).
- ``datasets``: PCN-family dataset readers + fixed-shape transform pipeline.
- ``parallel``: device-mesh construction and sharding rules (dp + tp) for pjit.
- ``utils``:    registry, YAML config with ``_base_`` inheritance, metrics, logging,
                schedulers, checkpointing.
- ``tools``:    train/eval runner, builders, single-cloud inference.
"""

__version__ = "0.1.0"
