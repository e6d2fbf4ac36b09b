"""CLI smoke tests: every subcommand drives the real pipelines end-to-end
on the session corpus/index and prints the documented output shape."""

import pytest

from distributed_text_search_ray.cli import main


@pytest.fixture(scope="module")
def cli_env(built_index_r3):
    corpus_dir, index_dir = built_index_r3
    return corpus_dir, index_dir


def _lines(capsys):
    return [ln for ln in capsys.readouterr().out.strip().splitlines() if ln]


def test_cli_search(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["search", index_dir, "def tokenize", "--topk", "3"]) in (0, None)
    lines = _lines(capsys)
    assert lines and all(len(ln.split("\t")) == 4 for ln in lines)


def test_cli_fsearch_single_member_matches_search(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["search", index_dir, "def tokenize", "--topk", "3"]) in (0, None)
    plain = _lines(capsys)
    assert main(
        ["fsearch", "--index", index_dir, "def tokenize", "--topk", "3"]
    ) in (0, None)
    assert _lines(capsys) == plain


def test_cli_fuzzy(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["fuzzy", index_dir, "tokenzie", "--k", "1"]) in (0, None)
    lines = _lines(capsys)
    assert len(lines) == 1 and len(lines[0].split("\t")) == 4


def test_cli_apm_reference_output_shape(cli_env, capsys):
    corpus_dir, _ = cli_env
    assert main(["apm", corpus_dir, "1", "data", "qq"]) in (0, None)
    lines = _lines(capsys)
    # reference output: one count per pattern in argv order (src/apm1.c:294-299)
    assert len(lines) == 2
    assert lines[0].startswith("Number of matches for pattern <data>:")
    assert lines[1].startswith("Number of matches for pattern <qq>:")


def test_cli_prefix_stats_and_topk(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["prefix", index_dir, "de", "zzzq"]) in (0, None)
    lines = _lines(capsys)
    assert len(lines) == 2
    assert lines[1].split("\t")[1:] == ["0", "0", "0"]  # zzzq matches nothing
    assert main(["prefix", index_dir, "de", "--topk", "2"]) in (0, None)
    lines = _lines(capsys)
    assert lines and all(len(ln.split("\t")) == 4 for ln in lines)


def test_cli_bool(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["bool", index_dir, "def AND NOT zzznever"]) in (0, None)
    assert _lines(capsys)


def test_cli_search_with_boolean_filter(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["search", index_dir, "data index", "--topk", "3",
                 "--filter", "def AND NOT zzznever"]) in (0, None)
    lines = _lines(capsys)
    assert lines and all(len(ln.split("\t")) == 4 for ln in lines)


def test_cli_hybrid_and_explain(cli_env, capsys):
    corpus_dir, index_dir = cli_env
    assert main(["hybrid", index_dir, corpus_dir, "def tokenize", "--topk", "3"]) in (0, None)
    lines = _lines(capsys)
    assert lines and all(len(ln.split("\t")) == 4 for ln in lines)
    doc = int(lines[0].split("\t")[2])
    assert main(["explain", index_dir, "def tokenize", str(doc)]) in (0, None)
    import json as _json

    exp = _json.loads(capsys.readouterr().out)
    assert {"terms", "score", "doc_id"} <= set(exp)


def test_cli_info(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["info", index_dir]) in (0, None)
    import json as _json

    info = _json.loads(capsys.readouterr().out)
    assert info["N"] == 240 and info["complete"] and info["n_deleted"] == 0


def test_cli_dsir(cli_env, capsys):
    corpus_dir, _ = cli_env
    # target = the corpus itself: weights ~0 but the full path runs
    assert main(
        ["dsir", corpus_dir, corpus_dir, "--buckets", "128", "--fraction", "0.1"]
    ) in (0, None)
    lines = _lines(capsys)
    assert lines and all(len(ln.split("\t")) == 3 for ln in lines)


def test_cli_merge_validate_disjoint_flag(cli_env, tmp_path, capsys):
    import json as _json

    _, index_dir = cli_env
    # merging an index with itself must be rejected by the exact validator
    with pytest.raises(ValueError, match="share doc ids|fingerprints"):
        main([
            "merge", str(tmp_path / "m"), index_dir, index_dir,
            "--validate-disjoint",
        ])


def test_cli_delete_then_compact(cli_env, tmp_path, capsys):
    import json as _json
    import os
    import shutil

    _, index_dir = cli_env
    clone = str(tmp_path / "clone")
    shutil.copytree(index_dir, clone, copy_function=os.link)
    # find a real doc id via a search, tombstone it, compact it away
    assert main(["search", clone, "def tokenize", "--topk", "1"]) in (0, None)
    victim = _lines(capsys)[0].split("\t")[2]
    assert main(["delete", clone, victim]) in (0, None)
    assert _json.loads(_lines(capsys)[-1])["n_deleted"] == 1
    out = str(tmp_path / "compacted")
    assert main(["compact", clone, out]) in (0, None)
    rep = _json.loads(_lines(capsys)[-1])
    assert rep["complete"] is True
    assert main(["search", out, "def tokenize", "--topk", "3"]) in (0, None)
    assert all(ln.split("\t")[2] != victim for ln in _lines(capsys))


def test_cli_wildcard_stats_and_topk(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["wildcard", index_dir, "d?f", "tok*n*"]) in (0, None)
    lines = _lines(capsys)
    assert len(lines) == 2 and all(len(ln.split("\t")) == 4 for ln in lines)
    assert main(["wildcard", index_dir, "tok*n*", "--topk", "3"]) in (0, None)
    lines = _lines(capsys)
    assert lines and all(len(ln.split("\t")) == 4 for ln in lines)


def test_cli_upsert(cli_env, tmp_path, capsys):
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    corpus_dir, index_dir = cli_env
    from distributed_text_search_ray.sources.corpus import corpus_files

    # changeset: replace the first doc with new content
    first = pq.read_table(corpus_files(corpus_dir)[0]).slice(0, 1).to_pylist()[0]
    first["content"] = "upserted cli changeset content with unique zebra tokens"
    delta = tmp_path / "delta"
    delta.mkdir()
    pq.write_table(
        pa.table({k: [v] for k, v in first.items()}), delta / "part0.parquet"
    )
    out = str(tmp_path / "upserted")
    assert main(["upsert", index_dir, str(delta), out]) in (0, None)
    rep = _json.loads(_lines(capsys)[-1])
    assert rep["complete"] is True and rep["n_upserted"] == 1
    assert main(["search", out, "unique zebra tokens", "--topk", "1"]) in (0, None)
    assert len(_lines(capsys)) == 1  # the replaced doc is findable by new text


def test_cli_search_msm(cli_env, capsys):
    _, index_dir = cli_env
    assert main(["search", index_dir, "def return value", "--msm", "2"]) in (0, None)
    msm_lines = _lines(capsys)
    assert all(len(ln.split("\t")) == 4 for ln in msm_lines)
    assert main(["search", index_dir, "def return value"]) in (0, None)
    plain_lines = _lines(capsys)
    # msm=2 is a (possibly equal) subset of the plain OR hit docs
    assert len(msm_lines) <= len(plain_lines)


def test_cli_clusters(cli_env, capsys):
    corpus_dir, _ = cli_env
    assert main(
        ["clusters", corpus_dir, "--threshold", "0.5", "--bucket", "shingle"]
    ) in (0, None)
    lines = _lines(capsys)
    assert lines
    pairs = [tuple(map(int, ln.split("\t"))) for ln in lines]
    ids = {d for d, _ in pairs}
    assert len(ids) == len(pairs)  # one row per doc
    assert all(c in ids for _, c in pairs)  # cluster reps are real docs
    assert all(c <= d for d, c in pairs)  # rep = component min


def test_cli_rm3(cli_env, capsys):
    corpus_dir, index_dir = cli_env
    assert main(
        ["rm3", index_dir, corpus_dir, "def tokenize", "--topk", "3", "--lam", "1.0"]
    ) in (0, None)
    rm3 = _lines(capsys)
    assert rm3 and all(len(ln.split("\t")) == 4 for ln in rm3)
    # lam=1 -> ranking identical to plain search (scores scale by 1/|Q|)
    assert main(["search", index_dir, "def tokenize", "--topk", "3"]) in (0, None)
    plain = _lines(capsys)
    assert [ln.split("\t")[2] for ln in rm3] == [ln.split("\t")[2] for ln in plain]


def test_cli_reshard(cli_env, capsys, tmp_path):
    import json as _json

    _, index_dir = cli_env
    out = str(tmp_path / "split")
    assert main(["reshard", index_dir, out, "8"]) in (0, None)
    rep = _json.loads(_lines(capsys)[-1])
    assert rep["mode"] == "split" and rep["num_partitions"] == 8
    assert main(["search", out, "def tokenize", "--topk", "3"]) in (0, None)
    split_rows = _lines(capsys)
    assert main(["search", index_dir, "def tokenize", "--topk", "3"]) in (0, None)
    assert split_rows == _lines(capsys)
