from . import geometry, geometry_jax, heatmap

__all__ = ["geometry", "geometry_jax", "heatmap"]
