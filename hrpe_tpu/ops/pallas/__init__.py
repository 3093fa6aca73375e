from .integral_decode_nhwc import fused_heatmap_expectations_nhwc  # noqa: F401
