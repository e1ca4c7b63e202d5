"""file_analyzer_ray — a Ray-Data-native extraction engine.

A from-scratch rebuild of the capabilities of primeinc/file-analyzer
(reference at /root/reference, studied for WHAT it computes only) as a
streaming ``ray.data.Dataset`` pipeline:

- interleaved text+media documents ``(doc_id, spans, binary)``
- stateless zero-copy Arrow ``map_batches`` stages for span
  normalization, magic-byte sniffing, metadata KV extraction,
  container carving and OCR-style text-layer parsing
- actor pools for stateful stages (compiled multi-pattern signature
  automata, the deterministic mock-VLM scorer)
- ``groupby(content_hash)`` for exact dedup clustering; phash banding
  for near-dup
- resumable partitioned Parquet output with per-partition lineage
  manifests

No code is copied from the reference; file:line citations in
docstrings point at the behavior being re-expressed.
"""

__version__ = "0.1.0"
