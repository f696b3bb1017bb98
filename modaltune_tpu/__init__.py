"""ModalTune-TPU: a TPU-native (JAX/XLA/Pallas/pjit) multi-modal,
multi-task fine-tuning framework for slide-level foundation models.

Re-designed from scratch with the capabilities of the ModalTune reference
(martellab-sri/ModalTune): frozen Prov-GigaPath / TITAN slide encoders,
a trainable Modal Adapter (Injector/Extractor cross-attention), a
pathway-grouped gene encoder, clinical tokens, and CONCH-text knowledge
distillation — built TPU-first: static bucketed shapes, Pallas flash
attention with LSE, sharded training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
