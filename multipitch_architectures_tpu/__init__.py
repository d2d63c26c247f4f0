"""multipitch_architectures_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
multi-pitch estimation in music recordings.

Re-designed from scratch with the capabilities of the PyTorch reference
``christofw/multipitch_architectures`` (Weiß & Peeters, IEEE/ACM TASLP 2022):

- ``dsp``         on-device HCQT feature frontend (multirate CQT as per-octave
                  kernel matmuls / Pallas kernel; harmonic stacking; tuning
                  estimation; annotation rasterizers)
- ``data``        context-window batching as XLA gathers + on-device augmentation
- ``io``          native C++ mmap npy loader with threaded window assembly
- ``models``      the full architecture ladder (CNN/DCNN/DRCNN, U-Nets,
                  SAUnet/SAUSnet, BLUnet, PUnet) as flax modules + torch
                  checkpoint porters (both directions)
- ``train``       one configurable trainer replacing the reference's 111 scripts
- ``eval``        vectorized multipitch measures + whole-recording inference
- ``parallel``    device-mesh sharding (dp/tp) via jax.sharding + jit
- ``serve``       AOT-exported StableHLO serving artifacts (jax.export)
- ``experiments`` registry of all 111 reference experiment configs + runner
- ``ops``         torch-semantics numerical primitives + Pallas TPU kernels
- ``utils``       profiling/tracing, model summaries, plotting
"""

__version__ = "0.1.0"
