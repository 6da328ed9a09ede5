"""searchenginesimple_ray — a Ray-Data-native full-text engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference C++ engine `luhcow/searchEnginesimple`
(read-only at /root/reference), re-expressed as idiomatic Ray Data:

- `ray.data.Dataset` pipelines of `map_batches` over zero-copy Arrow;
- actor pools for stateful stages (tokenizer, simhash, scorers);
- explicit hash partitioning (FNV-1a parity with the reference's
  `include/helper/ihsah.hpp:8-27`) and hot-term skew splitting;
- per-partition Parquet checkpoints with lineage manifests;
- a BM25 + reference-literal-cosine query path over a sharded
  compressed (delta+varbyte, block-max) inverted index.

See SURVEY.md for the full operator inventory and file:line citations.
"""

__version__ = "0.1.0"

from .config import EngineConfig  # noqa: F401
