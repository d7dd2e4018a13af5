

def test_gram_matrix_int_matches_numpy(spark):
    import numpy as np

    from agnes_spark.operators.embeddings import (
        gram_matrix_int,
        quantize_embeddings_floor,
    )

    rng = [[0.5, -1.0, 0.25], [2.0, 0.0, -0.5], [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<double>"
    )
    q = quantize_embeddings_floor(df, "embedding", "q_vec")
    qrows = {r.vec_id: r.q_vec for r in q.collect()}
    # floor semantics incl. the all-zero row
    assert qrows[2] == [0, 0, 0]
    assert qrows[3] == [127, 127, 127]
    M = np.array([qrows[i] for i in range(4)], dtype=np.int64)
    G = M.T @ M
    got = {(r.i, r.j): r.g for r in gram_matrix_int(q, "q_vec").collect()}
    for i in range(3):
        for j in range(i, 3):
            assert got[(i, j)] == G[i, j]
    assert len(got) == 6  # upper triangle only
