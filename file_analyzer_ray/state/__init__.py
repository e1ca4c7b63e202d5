"""Lineage manifests + resumable partitioned output."""
