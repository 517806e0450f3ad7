"""Ray-Data-native MySQL slow-log processing engine.

A from-scratch reimplementation of the query/data-processing capabilities of
percona/mysql-log-parser (reference at /root/reference, Go) as idiomatic Ray
Data pipelines: ``ray.data.Dataset`` of pre-tokenized sequences ->
``map_batches`` parse/fingerprint (zero-copy Arrow) -> actor-pool enrichment
-> fan-out routed Parquet sinks -> grouped aggregation with mergeable
sketches.

Layout:
  functions/  pure per-record logic (slow-log state machine, fingerprint,
              checksum, timestamp conversion) - no Ray dependency
  sources/    sequence table readers, tokenizer, synthetic corpus + dim table
  stages/     Ray Data batch transforms (parse, enrich, route, aggregate)
  state/      GK quantile sketch, checkpoint/lineage manifests
  pipelines/  end-to-end DAG assembly + report
  training/   large-scale training-data ops (dedup, similarity, text, multimodal)
"""

__version__ = "0.1.0"
