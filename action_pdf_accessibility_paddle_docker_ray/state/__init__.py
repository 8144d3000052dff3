"""Resumable execution state: per-partition lineage manifests."""

from .manifest import load_manifest, metrics_report, run_resumable

__all__ = ["run_resumable", "load_manifest", "metrics_report"]
