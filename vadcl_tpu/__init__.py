"""vadcl_tpu — TPU-native clustering-guided video anomaly detection framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of the
PyTorch reference ``Bun-TianYi/Video-anomaly-detection-guided-by-clustering-learning``
(the full importable name ``video-anomaly-detection-guided-by-clustering-learning_tpu``
is not a valid Python identifier; ``vadcl_tpu`` is its import name).

Subpackages
-----------
core      typed config tree, mesh/distributed setup, RNG threading, dtype policy
ops       hot compute primitives (windowed 3D attention, cluster assignment,
          3D conv/deconv with exact torch-parity semantics, memory addressing)
models    flax.linen modules: Swin3D encoder, Swin decoder (recon/predict),
          cluster heads, I3D Inception blocks, MNAD memory, UNet3D, ConvAE,
          and the composite VADModel
data      host-sharded frame-folder dataset + transforms + synthetic fixtures
train     jitted train step (shard_map DP), staged schedule, checkpointing
eval      PSNR -> anomaly score -> per-scene AUROC, sliding-window protocols
parallel  mesh/sharding helpers, multihost gather
viz       recon dumps, error heatmaps, cluster embedding export
"""

__version__ = "0.1.0"
