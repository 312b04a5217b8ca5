"""cogview_tpu — a TPU-native (JAX/XLA/Pallas/pjit) text-to-image framework.

A from-scratch rebuild of the capabilities of THUDM/CogView (reference layout
documented in SURVEY.md): a VQ-VAE image tokenizer unified with a Chinese
SentencePiece text vocabulary, a multi-billion-parameter decoder-only
transformer with Sandwich-LayerNorm, a KV-cached autoregressive sampling
engine (text2image / image2text / super-resolution / post-selection), and a
full SPMD training stack over a ``Mesh(('data', 'model'))``.

Nothing in here is a port: the compute path is jnp/Pallas under jit, the
parallelism is sharding annotations over an ICI mesh, and state is functional
pytrees.
"""

__version__ = "0.1.0"
