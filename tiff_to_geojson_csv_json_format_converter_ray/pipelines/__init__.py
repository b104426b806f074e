"""End-to-end Dataset pipelines assembled from stages."""
