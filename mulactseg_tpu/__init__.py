"""mulactseg_tpu — TPU-native framework for region-based active learning
semantic segmentation with multi-class (partial) label queries.

A ground-up JAX/XLA/Pallas re-design of the capabilities of MulActSeg
(Hwang et al., NeurIPS 2023; reference at /root/reference): DeepLabV3+
models with cosine classifiers, partial-label losses over superpixel
regions, class-balanced BvSB acquisition, cosine-prototype pseudo
labeling, and the five-round active-learning protocol — all built on
static-shape, compiler-friendly segment reductions instead of
torch_scatter, and on jax.sharding/pjit instead of single-GPU loops.
"""

__version__ = "0.1.0"
