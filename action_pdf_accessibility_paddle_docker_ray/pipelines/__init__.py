"""Composed ray.data.Dataset pipelines and the operator library."""
