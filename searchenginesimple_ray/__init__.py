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


def _stub_fsspec_http() -> None:
    """Make `fsspec.implementations.http` importable when aiohttp is
    absent.  Ray Data probes `from fsspec.implementations.http import
    HTTPFileSystem` on EVERY datasource/datasink construction; in this
    environment that import always fails (no aiohttp), the failed module
    is evicted from sys.modules each time, and two threads racing the
    re-import can observe a half-initialized module => a plain
    ImportError that escapes Ray's ModuleNotFoundError guard.  A stub
    class makes the probe deterministic; isinstance() against it is
    False for every real filesystem, which is the semantic Ray wants.
    """
    import sys
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ImportError:
        import types
        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod


_stub_fsspec_http()

from .config import EngineConfig  # noqa: F401
