import logging
import shutil

import pyarrow.parquet as pq
import pytest

import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def xs_path():
    from miru_ray.fixtures import transcripts_path
    return transcripts_path("xs")


@pytest.fixture(scope="session")
def xs_table(xs_path):
    return pq.read_table(xs_path)


@pytest.fixture(scope="session")
def xs_oracle(xs_table):
    from miru_ray.query.oracle import OracleIndex
    return OracleIndex(xs_table)


@pytest.fixture(scope="session")
def xs_index(ray_session, xs_path, tmp_path_factory):
    """Session-built index over the xs fixture (1k-doc partitions, 2 shards)."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    d = str(tmp_path_factory.mktemp("idx") / "xs")
    shutil.rmtree(d, ignore_errors=True)
    build_index(xs_path, d, IndexConfig(docs_per_partition=1000, num_shards=2))
    return d


@pytest.fixture(scope="session")
def xs_searcher(xs_index):
    from miru_ray.query.engine import Searcher
    s = Searcher(xs_index, num_readers=2)
    yield s
    s.close()
