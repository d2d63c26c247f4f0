"""multipitch_architectures_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multi-pitch estimation in music recordings.

Re-designed from scratch with the capabilities of the PyTorch reference
``christofw/multipitch_architectures`` (Weiß & Peeters, IEEE/ACM TASLP 2022):

- ``dsp``       on-device HCQT feature frontend (CQT as FFT + log-frequency
                filterbank matmuls; harmonic stacking; annotation rasterizer)
- ``data``      context-window batching as XLA gathers + on-device augmentation
- ``models``    the full architecture ladder (CNN/DCNN/DRCNN, U-Nets,
                SAUnet/SAUSnet, BLUnet, PUnet) as flax modules
- ``train``     one configurable trainer replacing the reference's 111 scripts
- ``eval``      vectorized multipitch measures + whole-recording inference
- ``parallel``  device-mesh sharding (dp/tp) via jax.sharding + jit
- ``ops``       torch-semantics numerical primitives + Pallas TPU kernels
"""

__version__ = "0.1.0"
