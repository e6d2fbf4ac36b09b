import os

import pytest
import ray

os.environ.setdefault("RAY_DEDUP_LOGS", "0")


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def code_corpus(tmp_path_factory):
    """Seeded synthetic code_like corpus (4 shards) + its doc list."""
    from distributed_text_search_ray.sources.synth import write_corpus

    d = tmp_path_factory.mktemp("corpus") / "code"
    paths = write_corpus(str(d), n_shards=4, docs_per_shard=60, profile="code_like", seed=7)
    return str(d), paths


def corpus_docs(corpus_dir: str):
    """[(doc_id, content)] exactly as the engine assigns ids."""
    import pyarrow.parquet as pq

    from distributed_text_search_ray.functions.hashing import doc_fingerprint
    from distributed_text_search_ray.sources.corpus import corpus_files

    docs = []
    for f in corpus_files(corpus_dir):
        t = pq.read_table(f)
        names = t.column_names
        for row in t.to_pylist():
            doc_id = row["doc_id"] if "doc_id" in names else doc_fingerprint(row["repo"], row["path"])
            docs.append((doc_id, row["content"]))
    return docs


@pytest.fixture(scope="session")
def built_index_r3(code_corpus, tmp_path_factory):
    """Session-scoped small index for round-3 index-assisted operators."""
    from distributed_text_search_ray import IndexConfig
    from distributed_text_search_ray.pipelines.build import build_index

    corpus_dir, _ = code_corpus
    index_dir = str(tmp_path_factory.mktemp("idx_r3") / "idx")
    build_index(corpus_dir, index_dir, IndexConfig(num_partitions=4))
    return corpus_dir, index_dir
