

def test_components_reliable_checkpoint(spark, tmp_path):
    """reliable=True runs the same fixpoint through checkpoint() against a
    configured checkpoint dir (the executor-loss-safe path for long runs)."""
    from n2khab_mhq_data_spark.llmdata.dedup import connected_components

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "d1 long, d2 long"
    )
    out = {
        r.doc: r.component_id
        for r in connected_components(edges, reliable=True).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    import os

    assert os.listdir(str(tmp_path / "ckpt"))  # something was checkpointed
