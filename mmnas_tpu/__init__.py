"""mmnas_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal NAS framework.

A ground-up rebuild of the capabilities of MILVLG/mmnas (ACM MM 2020,
"Deep Multimodal Neural Architecture Search"): a weight-sharing supernet
search over a unified encoder-decoder multimodal architecture, plus fixed-
architecture training/evaluation on three tasks:

- VQA — visual question answering (VQA-v2 + Visual Genome)
- VGD — visual grounding (RefCOCO / RefCOCO+ / RefCOCOg)
- ITM — image-text matching (Flickr30K) with online hard-negative mining

Design (TPU-first, not a port):
- All compute is pure-functional JAX over parameter pytrees; every train /
  search / eval step is a single jitted XLA program with static shapes.
- NAS sampling happens *inside* the compiled step: per-block categorical
  gates are drawn with `jax.random`, the weight step executes only the
  sampled branch via `lax.switch`, and the arch step runs all branches and
  combines them with straight-through one-hot gates, so the ProxylessNAS
  softmax-Jacobian alpha gradient falls out of autodiff.
- Parallelism is a `jax.sharding.Mesh` ("data", "model") with pjit-style
  sharding constraints; XLA inserts all collectives (no hand-written NCCL
  analog).
- Hot attention ops (SA / GA / RSA with geometry bias) have fused Pallas
  TPU kernels; everything else relies on XLA fusion.
"""

__version__ = "0.1.0"
