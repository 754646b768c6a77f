"""climategan_tpu — a TPU-native (JAX/XLA/Pallas) climate-event rendering
framework with the capabilities of cc-ai/climategan.

Masker (DeepLabV3+ multi-head: depth / segmentation / flood-mask) +
SPADE Painter, plus wildfire / smog / flood event compositing, training
with ADVENT domain adaptation, and data-parallel execution over a
``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from climategan_tpu.utils.opts import Opts, load_opts  # noqa: F401
