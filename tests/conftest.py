import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (never per test/module)."""
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_corpus():
    """(parquet_path, OracleIndex, queries) for the golden fixture corpus."""
    import pyarrow.parquet as pq

    from bge_m3_onnx_ray.fixtures import gen_queries, transcripts_path
    from bge_m3_onnx_ray.oracle import OracleIndex

    path = transcripts_path(2000, 42)
    t = pq.read_table(path)
    oi = OracleIndex(zip(t.column("conv_id").to_pylist(),
                         t.column("turn_idx").to_pylist(),
                         t.column("text").to_pylist()))
    return path, oi, gen_queries(50)


@pytest.fixture(scope="session")
def tiny_index(ray_session, tiny_corpus, tmp_path_factory):
    """Index built once over the golden fixture corpus (tiny shards so the
    sharded merge/search paths are actually exercised)."""
    from bge_m3_onnx_ray.config import create_tiny_index_config
    from bge_m3_onnx_ray.index.build import build_index

    path, _, _ = tiny_corpus
    idx = str(tmp_path_factory.mktemp("idx") / "index")
    res = build_index(path, idx, create_tiny_index_config())
    return idx, res
