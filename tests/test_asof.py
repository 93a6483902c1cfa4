from vietnamese_ocr_spark.operators.asof import asof_join


def test_asof_join_hand_example(spark):
    left = spark.createDataFrame(
        [("u1", 5, "a"), ("u1", 10, "b"), ("u1", 2, "c"), ("u2", 7, "d")],
        "k string, t int, tag string",
    ).withColumnRenamed("t", "ts")
    right = spark.createDataFrame(
        [("u1", 3, 30), ("u1", 8, 80), ("u2", 9, 90)],
        "k string, rt int, val int",
    )
    out = asof_join(left, right, "k", "ts", "rt", ["val"])
    got = {(r["k"], r["ts"]): r["asof_val"] for r in out.collect()}
    assert got == {
        ("u1", 2): None,   # no right row at or before t=2
        ("u1", 5): 30,     # rt=3
        ("u1", 10): 80,    # rt=8
        ("u2", 7): None,   # u2's only right row is later (rt=9)
    }
    assert out.count() == 4  # every left row survives exactly once


def test_asof_join_tie_semantics(spark):
    left = spark.createDataFrame([("u", 5, "x")], "k string, ts int, tag string")
    right = spark.createDataFrame([("u", 5, 1)], "k string, rt int, val int")
    inclusive = asof_join(left, right, "k", "ts", "rt", ["val"], tie_right_first=True)
    strict = asof_join(left, right, "k", "ts", "rt", ["val"], tie_right_first=False)
    assert inclusive.collect()[0]["asof_val"] == 1
    assert strict.collect()[0]["asof_val"] is None
