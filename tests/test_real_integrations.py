"""Real-library integration seams (r8 verdict #4/#5).

Two injection seams carry deterministic fakes in this container
because the heavy libraries are absent: the embedding model
(`embed_with_model` / `_FakeModel`) and the media codec
(`media_features` / `FakeMediaCodec`). Each seam gets BOTH:

- a runtime-GATE test that runs green HERE: constructing the real
  adapter without the library raises the documented ImportError
  naming the seam and the swap instruction (never an opaque
  ModuleNotFoundError from deep inside a worker), and
- a skip-if-absent INTEGRATION test that proves the real branch
  (sentence-transformers encode shape / PIL PNG decode) when the
  library IS installed — on a production image these run instead of
  skipping, so the seam is verified on both sides of the boundary.
"""
import importlib.util

import pytest

HAS_ST = importlib.util.find_spec("sentence_transformers") is not None
HAS_PIL = importlib.util.find_spec("PIL") is not None


# ------------------- embedding model seam (T4) ---------------------


@pytest.mark.skipif(
    HAS_ST, reason="sentence-transformers installed: gate unreachable"
)
def test_sentence_transformer_adapter_gate_names_the_seam():
    from citeconnect_datapipeline_spark.operators.similarity import (
        SentenceTransformerModel,
    )

    with pytest.raises(ImportError, match="embed_with_model"):
        SentenceTransformerModel.get("all-MiniLM-L6-v2")


def test_sentence_transformer_factory_is_picklable():
    """The factory closure must survive pickling to executors even
    where the library is absent — the import is deferred to get()."""
    import pickle

    from citeconnect_datapipeline_spark.operators.similarity import (
        SentenceTransformerModel,
    )

    f = SentenceTransformerModel.factory("all-MiniLM-L6-v2")
    f2 = pickle.loads(pickle.dumps(f))
    assert f2.args[0] == "all-MiniLM-L6-v2"


@pytest.mark.skipif(
    not HAS_ST, reason="sentence-transformers not installed"
)
def test_embed_with_real_model_end_to_end(spark):
    """Real inference through the SAME plan the fake exercises:
    mapInPandas, executor-local singleton, (n_texts -> n_vectors,
    fixed dim) contract, normalized vectors."""
    import math

    from citeconnect_datapipeline_spark.operators.similarity import (
        SentenceTransformerModel,
        embed_with_model,
    )

    docs = spark.createDataFrame(
        [(1, "spark shuffles data"), (2, "ducks quack loudly")],
        "doc_id long, text string",
    )
    rows = embed_with_model(
        docs, SentenceTransformerModel.factory("all-MiniLM-L6-v2")
    ).collect()
    assert len(rows) == 2
    dims = {len(r["embedding"]) for r in rows}
    assert len(dims) == 1 and dims.pop() > 0
    for r in rows:
        norm = math.sqrt(sum(x * x for x in r["embedding"]))
        assert abs(norm - 1.0) < 1e-3  # normalize_embeddings=True
        assert r["model_name"] == "all-MiniLM-L6-v2"


# --------------------- media codec seam (§2.12) ---------------------


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed: gate unreachable")
def test_real_media_codec_gate_names_the_seam():
    from citeconnect_datapipeline_spark.operators.multimodal import (
        RealMediaCodec,
    )

    RealMediaCodec._instance = None
    with pytest.raises(ImportError, match="FakeMediaCodec"):
        RealMediaCodec.get()


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_real_media_codec_decodes_png():
    """The image branch against a real PNG: width/height from actual
    pixels, single frame, zero duration — FakeMediaCodec's schema,
    real values."""
    import io

    from PIL import Image

    from citeconnect_datapipeline_spark.operators.multimodal import (
        RealMediaCodec,
    )

    buf = io.BytesIO()
    Image.new("RGB", (37, 21)).save(buf, format="PNG")
    out = RealMediaCodec.get().decode("image", buf.getvalue())
    assert out == {
        "width": 37,
        "height": 21,
        "duration_sec": 0.0,
        "n_frames": 0,
    }


def test_real_media_codec_audio_video_still_stubbed():
    """audio/video need librosa/pyav regardless of PIL — the
    NotImplementedError contract holds on every image-capable
    install until those branches land."""
    from citeconnect_datapipeline_spark.operators.multimodal import (
        RealMediaCodec,
    )

    codec = object.__new__(RealMediaCodec)  # skip the PIL gate
    codec._image = None
    with pytest.raises(NotImplementedError, match="audio"):
        codec.decode("audio", b"\x00")


# -------------- offline real model: hash-projection (T4) ------------


def test_hash_projection_model_end_to_end_in_container(spark, tmp_path):
    """A NON-fake model through the full T4 path, runnable in this
    container (numpy only): publish the named model to the lake,
    load its factory, run real inference through embed_with_model,
    and assert embedding semantics a per-text hash fake cannot show
    — token overlap moves cosine similarity (r9 verdict #6)."""
    import math

    from citeconnect_datapipeline_spark.operators.similarity import (
        HashProjectionModel,
        embed_with_model,
    )
    from citeconnect_datapipeline_spark.sinks.models import (
        load_embedding_model,
        save_embedding_model,
    )

    model_path = str(tmp_path / "models" / "hash_projection_v1")
    save_embedding_model(
        spark, HashProjectionModel.get().spec, model_path
    )
    factory = load_embedding_model(spark, model_path)

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across executors"),
            (2, "spark shuffles data across the cluster"),
            (3, "ducks quack loudly at dawn"),
        ],
        "doc_id long, text string",
    ).repartition(3)  # exercise the per-worker singleton path
    rows = {
        r["doc_id"]: r for r in embed_with_model(docs, factory).collect()
    }
    assert len(rows) == 3
    assert all(r["model_name"] == "hash-projection-v1" for r in rows.values())
    vecs = {k: list(r["embedding"]) for k, r in rows.items()}
    assert {len(v) for v in vecs.values()} == {64}
    for v in vecs.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    # token-overlapping texts are nearer than unrelated ones — real
    # bag-of-tokens geometry, not hash noise
    assert cos(vecs[1], vecs[2]) > 0.5 > cos(vecs[1], vecs[3])

    # determinism across a fresh load of the published spec
    rows2 = {
        r["doc_id"]: list(r["embedding"])
        for r in embed_with_model(
            docs, load_embedding_model(spark, model_path)
        ).collect()
    }
    assert rows2 == vecs


def test_embedding_model_artifact_corruption_gate(spark, tmp_path):
    from citeconnect_datapipeline_spark.sinks.models import (
        load_embedding_model,
    )

    bad = str(tmp_path / "bad_model")
    spark.createDataFrame(
        [("a", 8, 64, 1), ("b", 8, 64, 2)],
        "name string, dim int, n_features int, seed int",
    ).write.parquet(bad)
    with pytest.raises(ValueError, match="expected exactly 1 spec row"):
        load_embedding_model(spark, bad)


def test_hash_projection_model_empty_batch():
    """encode([]) returns [] — the n_texts -> n_vectors contract
    holds at zero (round-10 review #4)."""
    from citeconnect_datapipeline_spark.operators.similarity import (
        HashProjectionModel,
    )

    assert HashProjectionModel.get().encode([]) == []


# ----------------- jdbc_upsert against a REAL embedded DB -----------


def _sqlite_factory(path):
    """Picklable per-partition connection factory (functools.partial
    over the stdlib connector; 30 s busy timeout so concurrent
    partitions queue on sqlite's file lock instead of failing)."""
    import functools
    import sqlite3

    return functools.partial(sqlite3.connect, path, 30.0)


def test_jdbc_upsert_against_real_sqlite(spark, tmp_path):
    """r10 verdict #6: the ON CONFLICT batching/transaction path
    end-to-end against a real embedded database — real SQL parse,
    real unique-constraint conflicts, real rowcounts, real commits,
    driven from executor processes via mapPartitions."""
    import sqlite3

    from citeconnect_datapipeline_spark.sinks.upsert import jdbc_upsert

    db = str(tmp_path / "upsert.db")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE papers ("
            "id INTEGER PRIMARY KEY, title TEXT, cites INTEGER)"
        )
        con.executemany(
            "INSERT INTO papers VALUES (?, ?, ?)",
            [(1, "old one", 10), (2, "old two", 20)],
        )

    # ---- phase 1: DO NOTHING — conflicts are skipped, new rows land
    batch = spark.createDataFrame(
        [(1, "new one", 11), (3, "three", 30), (4, "four", 40)],
        "id long, title string, cites long",
    ).repartition(2)
    stats = jdbc_upsert(
        batch, "papers", "id", _sqlite_factory(db),
        on_conflict="nothing", paramstyle="qmark",
    )
    assert stats == {
        "attempted": 3, "inserted": 2, "skipped": 1,
        "failed": 0, "retried": 0,
    }
    with sqlite3.connect(db) as con:
        rows = dict(
            (i, (t, c))
            for i, t, c in con.execute(
                "SELECT id, title, cites FROM papers ORDER BY id"
            )
        )
    assert rows[1] == ("old one", 10)  # conflict skipped, not updated
    assert rows[3] == ("three", 30) and rows[4] == ("four", 40)

    # ---- phase 2: DO UPDATE — conflicts merge via excluded.*
    merge = spark.createDataFrame(
        [(1, "merged one", 12), (5, "five", 50)],
        "id long, title string, cites long",
    ).repartition(2)
    stats = jdbc_upsert(
        merge, "papers", "id", _sqlite_factory(db),
        on_conflict="update", paramstyle="qmark",
    )
    assert stats["attempted"] == 2 and stats["failed"] == 0
    with sqlite3.connect(db) as con:
        rows = dict(
            (i, (t, c))
            for i, t, c in con.execute("SELECT id, title, cites FROM papers")
        )
    assert rows[1] == ("merged one", 12)  # conflict row really updated
    assert rows[5] == ("five", 50)
    assert len(rows) == 5

    # ---- idempotence: re-running the merge changes nothing
    stats2 = jdbc_upsert(
        merge, "papers", "id", _sqlite_factory(db),
        on_conflict="update", paramstyle="qmark",
    )
    assert stats2["failed"] == 0
    with sqlite3.connect(db) as con:
        assert con.execute("SELECT COUNT(*) FROM papers").fetchone()[0] == 5


def test_jdbc_upsert_sqlite_row_fallback_isolates_bad_row(spark, tmp_path):
    """A genuinely unsatisfiable row (CHECK-constraint violation —
    sqlite silently auto-assigns rowids for NULL integer PKs, so a
    CHECK is the honest way to make the engine reject a row) fails
    the batch statement; the fallback isolates it so the good rows in
    the same batch still commit — the reference's per-paper continue,
    proven on real transactions."""
    import sqlite3

    from citeconnect_datapipeline_spark.sinks.upsert import jdbc_upsert

    db = str(tmp_path / "fallback.db")
    with sqlite3.connect(db) as con:
        con.execute(
            "CREATE TABLE t (id INTEGER PRIMARY KEY, "
            "v TEXT CHECK (v <> 'poison'))"
        )
    df = spark.createDataFrame(
        [(10, "good"), (12, "poison"), (11, "also good")],
        "id long, v string",
    ).coalesce(1)
    stats = jdbc_upsert(
        df, "t", "id", _sqlite_factory(db), paramstyle="qmark",
    )
    assert stats["attempted"] == 3
    assert stats["inserted"] == 2 and stats["failed"] == 1
    with sqlite3.connect(db) as con:
        got = sorted(con.execute("SELECT id FROM t"))
    assert got == [(10,), (11,)]


def test_jdbc_upsert_rejects_unknown_paramstyle(spark):
    from citeconnect_datapipeline_spark.sinks.upsert import jdbc_upsert

    df = spark.createDataFrame([(1, "x")], "id long, v string")
    with pytest.raises(ValueError, match="paramstyle"):
        jdbc_upsert(df, "t", "id", lambda: None, paramstyle="numeric")
