"""Token-window chunking: boundaries, overlap, short tails."""

from crypto_etl_airflow_spark.operators.chunking import chunk_token_windows


def test_chunk_windows_cover_with_overlap(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = sorted(
        chunk_token_windows(df, "doc_id", "text", chunk_size=4, stride=3).collect(),
        key=lambda r: r.start_tok,
    )
    # starts 1,4,7,10; last two windows are short tails
    assert [r.start_tok for r in out] == [1, 4, 7, 10]
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert [r.n_tokens for r in out] == [4, 4, 4, 1]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert out[3].chunk_text == "t9"


def test_single_short_doc_is_one_chunk(spark):
    df = spark.createDataFrame([(7, "just two")], "doc_id long, text string")
    out = chunk_token_windows(df, "doc_id", "text", chunk_size=32, stride=24).collect()
    assert len(out) == 1 and out[0].n_tokens == 2 and out[0].chunk_idx == 0
