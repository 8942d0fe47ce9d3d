"""Sources & sinks (SURVEY.md §2.1): CSV round-trip with quoting,
overwrite semantics, text source with stable doc ids."""

from __future__ import annotations

import os
import tempfile

from mapreduce_minhash_lsh_spark.sources.tables import (
    load_table,
    read_text_docs,
    register_views,
    upsert_parquet,
    write_csv,
)
from tests.conftest import SF_SMALL


def test_csv_roundtrip_with_hostile_values(spark):
    """S4/P8: quoted CSV survives commas, quotes, '-', and the literal
    header substrings the reference mishandles (SURVEY.md §2.7)."""
    rows = [
        (0, 'contains,comma'),
        (1, 'contains"quote'),
        (2, "contains-dash-like-the-reference-delimiter"),
        (3, "Shingling,rowsOffset"),  # looks like the reference's header
        (4, "Hash|pipe"),
    ]
    df = spark.createDataFrame(rows, ["id", "val"])
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out")
        write_csv(df, path)
        back = spark.read.option("header", True).csv(path)
        got = {(int(r.id), r.val) for r in back.collect()}
        assert got == set(rows)
        # S5: overwrite replaces, never appends
        write_csv(df.limit(2), path)
        assert spark.read.option("header", True).csv(path).count() == 2


def test_read_text_docs_stable_ids(spark):
    docs = read_text_docs(spark, "/root/reference/src/main/resources/documents.txt")
    rows = sorted((r.doc_id, r.text) for r in docs.collect())
    assert [i for i, _ in rows] == [0, 1, 2, 3, 4]
    assert rows[0][1] == "I ate an apple."
    assert rows[4][1].startswith("This sentence has a lot")


def test_register_views_exposes_all_tables(spark):
    register_views(spark, SF_SMALL)
    assert spark.sql("select count(*) c from documents").head().c == 500
    assert spark.sql(
        "select count(*) c from lineitem join orders on l_orderkey = o_orderkey"
    ).head().c > 0


def test_partitioned_parquet_sink(spark):
    """S4/S5 partitioned sink: partition column becomes directory layout,
    and a partition-pruned read only touches its slice."""
    import os
    import tempfile

    from mapreduce_minhash_lsh_spark.sources.tables import load_table, write_parquet

    docs = load_table(spark, SF_SMALL, "documents")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "by_lang")
        write_parquet(docs, path, partition_by=["lang"])
        langs = {r.lang for r in docs.select("lang").distinct().collect()}
        assert {p.split("=")[1] for p in os.listdir(path) if p.startswith("lang=")} == langs
        en = spark.read.parquet(path).where("lang = 'en'")
        assert en.count() == docs.where("lang = 'en'").count()
        import contextlib, io
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            en.explain("formatted")
        assert "PartitionFilters: [isnotnull(lang" in buf.getvalue()


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from mapreduce_minhash_lsh_spark.sources.tables import compact_parquet, load_table

    docs = load_table(spark, SF_SMALL, "documents")
    frag = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(frag)
    import glob
    assert len(glob.glob(frag + "/part-*")) >= 32

    out = str(tmp_path / "compact")
    n_out = compact_parquet(spark, frag, out)
    assert n_out == 1  # tiny corpus -> single target-size file
    assert len(glob.glob(out + "/part-*")) == 1
    a = {tuple(r) for r in spark.read.parquet(out).collect()}
    b = {tuple(r) for r in docs.collect()}
    assert a == b


def test_jsonl_round_trip_with_explicit_schema(spark, tmp_path):
    from mapreduce_minhash_lsh_spark.sources.tables import read_jsonl, write_jsonl

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(
        spark, path, schema="doc_id bigint, text string, lang string, source string"
    )
    a = {tuple(r) for r in back.select("doc_id", "text", "lang", "source").collect()}
    b = {tuple(r) for r in docs.select("doc_id", "text", "lang", "source").collect()}
    assert a == b


def _rows(spark, path):
    return {
        (r.k, r.part): r.v
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_parquet_partitioned_touches_only_hit_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
        "k long, part string, v long",
    )
    upsert_parquet(spark, base, path, ["k"], partition_col="part")
    untouched = os.path.join(path, "part=c")
    before = sorted(os.listdir(untouched))
    updates = spark.createDataFrame(
        [(2, "a", 99), (5, "b", 50)], "k long, part string, v long"
    )
    upsert_parquet(spark, updates, path, ["k"], partition_col="part")
    assert _rows(spark, path) == {
        (1, "a"): 10, (2, "a"): 99, (3, "b"): 30, (5, "b"): 50, (4, "c"): 40,
    }
    # partition c was neither read nor rewritten
    assert sorted(os.listdir(untouched)) == before
    # idempotent: replaying the same upsert changes nothing
    upsert_parquet(spark, updates, path, ["k"], partition_col="part")
    assert _rows(spark, path) == {
        (1, "a"): 10, (2, "a"): 99, (3, "b"): 30, (5, "b"): 50, (4, "c"): 40,
    }


def test_upsert_parquet_unpartitioned_swap(spark, tmp_path):
    path = str(tmp_path / "flat")
    base = spark.createDataFrame(
        [(1, "x", 1), (2, "x", 2)], "k long, part string, v long"
    )
    upsert_parquet(spark, base, path, ["k"])
    updates = spark.createDataFrame(
        [(2, "x", 22), (3, "x", 3)], "k long, part string, v long"
    )
    upsert_parquet(spark, updates, path, ["k"])
    assert _rows(spark, path) == {(1, "x"): 1, (2, "x"): 22, (3, "x"): 3}
    assert not os.path.exists(path + "__staging")
    assert not os.path.exists(path + "__old")


def test_upsert_remote_style_uri_merges_not_overwrites(spark, tmp_path):
    """VERDICT r10 #3: the existence probe must resolve the path's own
    scheme.  A ``file:`` URI is the locally-runnable stand-in for an
    s3a://hdfs:// store path: ``os.path.exists('file:/...')`` is always
    False, so the pre-fix probe would have routed this second upsert to
    the create branch and silently overwritten the table — key 1 would
    vanish."""
    local = str(tmp_path / "remote_tbl")
    uri = "file:" + local
    base = spark.createDataFrame(
        [(1, "x", 1), (2, "x", 2)], "k long, part string, v long"
    )
    upsert_parquet(spark, base, uri, ["k"])
    updates = spark.createDataFrame([(2, "x", 22)], "k long, part string, v long")
    upsert_parquet(spark, updates, uri, ["k"])
    assert _rows(spark, local) == {(1, "x"): 1, (2, "x"): 22}
    assert not os.path.exists(local + "__staging")
    assert not os.path.exists(local + "__old")


def test_delete_from_parquet_remote_style_uri_deletes(spark, tmp_path):
    """Same scheme-resolution pin for the delete primitive: pre-fix the
    probe saw False for a ``file:`` URI and the takedown silently became
    a no-op."""
    from mapreduce_minhash_lsh_spark.sources.tables import delete_from_parquet

    local = str(tmp_path / "remote_del")
    uri = "file:" + local
    base = spark.createDataFrame(
        [(1, "x", 1), (2, "x", 2), (3, "x", 3)], "k long, part string, v long"
    )
    upsert_parquet(spark, base, uri, ["k"])
    keys = spark.createDataFrame([(2,)], "k long")
    delete_from_parquet(spark, uri, keys, ["k"])
    assert _rows(spark, local) == {(1, "x"): 1, (3, "x"): 3}


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    from mapreduce_minhash_lsh_spark.sources.tables import read_orc, write_orc

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    a = {tuple(r) for r in back.collect()}
    b = {tuple(r) for r in docs.collect()}
    assert a == b
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.where("doc_id = 7").select("doc_id", "lang").explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(doc_id), EqualTo(doc_id,7)]" in plan


def test_ingest_example_end_to_end(spark, tmp_path):
    import examples.ingest_pipeline as ingest

    stats = ingest.run(spark, SF_SMALL, str(tmp_path / "store"))
    # store grows by exactly the surviving crawl docs
    assert stats["store_after"] == stats["store"] + stats["survivors"]
    # dedup only ever removes: crawl >= exact-unique >= near-dup survivors
    assert stats["crawl"] >= stats["exact_unique"] >= stats["survivors"]
    # the planted near-dups straddle the odd/even split, so the crawl
    # must lose documents to cross-corpus dedup
    assert stats["survivors"] < stats["crawl"]
    assert stats["compacted_files"] >= 1
    # compaction swapped in: same rows, partition layout preserved
    assert stats["store_final"] == stats["store_after"]
    store = str(tmp_path / "store")
    assert any(p.startswith("lang=") for p in os.listdir(store))
    assert not os.path.exists(store + "__compacted")
    assert not os.path.exists(store + "__old")


def test_upsert_parquet_null_partition_merges(spark, tmp_path):
    """A NULL partition value must MERGE like any other partition —
    isin() alone would silently replace the NULL partition."""
    path = str(tmp_path / "nulls")
    base = spark.createDataFrame(
        [(1, None, 10), (2, "a", 20)], "k long, part string, v long"
    )
    upsert_parquet(spark, base, path, ["k"], partition_col="part")
    updates = spark.createDataFrame([(3, None, 30)], "k long, part string, v long")
    upsert_parquet(spark, updates, path, ["k"], partition_col="part")
    assert _rows(spark, path) == {(1, None): 10, (2, "a"): 20, (3, None): 30}


def test_observed_quality_rides_the_action(spark, tmp_path):
    from mapreduce_minhash_lsh_spark.functions.monitor import observed_quality
    from mapreduce_minhash_lsh_spark.sources.tables import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    watched, obs = observed_quality(docs, "docs_in", ["text", "lang"])
    watched.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == docs.count()
    assert got["null_text"] == 0 and got["null_lang"] == 0

    import pytest

    with pytest.raises(ValueError):
        observed_quality(docs, "x", ["no_such_col"])


def test_apply_cdc_upserts_and_deletes(spark, tmp_path):
    from mapreduce_minhash_lsh_spark.sources.tables import apply_cdc

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]
    )
    base.write.parquet(path)
    changes = spark.createDataFrame(
        [(2, "B", "U"), (4, "d", "I"), (3, None, "D"), (5, "e", "U"), (5, None, "D")],
        ["id", "v", "op"],
    )
    apply_cdc(spark, changes, path, ["id"])
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    # 2 updated, 4 inserted, 3 deleted, 5 delete-wins-over-upsert
    assert got == {1: "a", 2: "B", 4: "d"}

    import pytest

    with pytest.raises(ValueError):
        apply_cdc(
            spark,
            spark.createDataFrame([(1, "x", "Z")], ["id", "v", "op"]),
            path,
            ["id"],
        )


def test_write_sorted_parquet_total_order(spark, tmp_path):
    import glob
    import os

    from mapreduce_minhash_lsh_spark.sources.tables import (
        load_table,
        write_sorted_parquet,
    )
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    path = str(tmp_path / "sorted")
    write_sorted_parquet(docs, path, ["doc_id"], n_files=4)
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    assert len(files) > 1
    ranges = []
    total = 0
    for f in files:
        ids = [r.doc_id for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids), f"{f} not internally sorted"
        if ids:
            ranges.append((ids[0], ids[-1]))
            total += len(ids)
    assert total == docs.count()
    # files hold non-overlapping, ascending ranges
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_fs_helpers_scheme_resolved(spark, tmp_path):
    """fs_exists/fs_delete (sources/fs.py) resolve the path's OWN
    filesystem — the probe every durable-store guard shares (VERDICT r9
    #5: bandstore _spec, bucketed warehouse, streaming split dirs)."""
    from mapreduce_minhash_lsh_spark.sources.fs import fs_delete, fs_exists

    p = str(tmp_path / "probe")
    assert not fs_exists(spark, p)
    spark.range(3).write.parquet(p)
    assert fs_exists(spark, p)
    assert fs_exists(spark, os.path.join(p, "_SUCCESS"))
    # explicit scheme works too (local deployments pass file:// URIs)
    assert fs_exists(spark, f"file://{p}")
    assert fs_delete(spark, p)
    assert not fs_exists(spark, p)
    assert not fs_delete(spark, p)  # deleting a missing path is False, not an error


def test_scratch_dir_refuses_squatted_root(spark, monkeypatch, tmp_path):
    """ADVICE r12: the scratch root path is predictable, so a
    pre-existing symlink or a group/other-accessible directory there
    must be refused, not silently reused."""
    import pytest

    from mapreduce_minhash_lsh_spark.sources import fs as fsmod

    fake_tmp = tmp_path / "t"
    fake_tmp.mkdir()
    monkeypatch.setattr(tempfile, "gettempdir", lambda: str(fake_tmp))
    app = spark.sparkContext.applicationId
    root = fake_tmp / f"mmlsh-scratch-{app}"

    # Symlink squatting: redirecting the root elsewhere is refused.
    elsewhere = tmp_path / "elsewhere"
    elsewhere.mkdir()
    root.symlink_to(elsewhere)
    with pytest.raises(RuntimeError, match="refusing"):
        fsmod.scratch_dir(spark, "x")
    root.unlink()

    # Loose permissions: a pre-created 0755 root is refused.
    root.mkdir(mode=0o755)
    with pytest.raises(RuntimeError, match="refusing"):
        fsmod.scratch_dir(spark, "x")
    root.rmdir()

    # Fresh creation works and is private.
    p = fsmod.scratch_dir(spark, "x")
    assert os.path.isdir(p)
    assert (os.lstat(root).st_mode & 0o777) == 0o700


def test_ensure_min_partitions_memo(spark):
    """The r14 per-session memo must reproduce the probed decision: a
    second load_table of the same table returns a plan with the same
    repartition shape as the first (exchange present for real tables,
    absent for tiny dimensions), without re-probing."""
    from mapreduce_minhash_lsh_spark.sources import tables as T

    T._MIN_PART_MEMO.clear()
    T._TABLE_MEMO.clear()
    first = T.load_table(spark, SF_SMALL, "lineitem")
    assert T._MIN_PART_MEMO, "first call must populate the memo"
    T._TABLE_MEMO.clear()  # force reconstruction through the decision memo
    second = T.load_table(spark, SF_SMALL, "lineitem")
    p1 = first._jdf.queryExecution().optimizedPlan().toString()
    p2 = second._jdf.queryExecution().optimizedPlan().toString()
    assert ("RepartitionByExpression" in p1) == ("RepartitionByExpression" in p2)
    # tiny dimension: decision is 'no repartition' on both calls
    r1 = T.load_table(spark, SF_SMALL, "region")
    r2 = T.load_table(spark, SF_SMALL, "region")
    assert "RepartitionByExpression" not in r1._jdf.queryExecution().optimizedPlan().toString()
    assert "RepartitionByExpression" not in r2._jdf.queryExecution().optimizedPlan().toString()
