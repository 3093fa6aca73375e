from .integral_decode import fused_heatmap_expectations  # noqa: F401
