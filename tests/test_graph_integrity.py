"""Degree assortativity (pipeline/er.py degree_assortativity),
dangling-object integrity (pipeline/triples.py dangling_objects), and the
GROUPING SETS surface vs hand-computed oracles on tiny graphs/tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from unsupervised_ner_spark.pipeline.er import degree_assortativity
from unsupervised_ner_spark.pipeline.triples import dangling_objects


def _cooc_df(spark, pairs):
    rows = [(a, "T", b, "T", 1, 1) for a, b in pairs]
    return spark.createDataFrame(
        rows,
        "ent_a string, type_a string, ent_b string, type_b string, "
        "n_sents long, n_docs long",
    )


def _expected_stats(pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    xs = [deg[a] for a, _ in sym]
    ys = [deg[b] for _, b in sym]
    m2 = len(sym)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sx2, sy2 = sum(x * x for x in xs), sum(y * y for y in ys)
    return {
        "m2": m2, "sum_x": sx, "sum_y": sy, "sum_xy": sxy,
        "sum_x2": sx2, "sum_y2": sy2,
        "r_num": m2 * sxy - sx * sy,
        "r_den_x": m2 * sx2 - sx * sx,
        "r_den_y": m2 * sy2 - sy * sy,
    }


def test_assortativity_star_is_disassortative(spark):
    # hub h connected to 4 leaves: perfectly disassortative, r_num < 0
    pairs = [("h", f"l{i}") for i in range(4)]
    row = degree_assortativity(_cooc_df(spark, pairs)).collect()[0].asDict()
    assert row == _expected_stats(pairs)
    assert row["r_num"] < 0
    # symmetry of the directed-both-ways construction
    assert row["sum_x"] == row["sum_y"] and row["r_den_x"] == row["r_den_y"]


def test_assortativity_ring_is_degree_regular(spark):
    # every node degree 2 -> zero variance -> r_num == r_den == 0
    pairs = [(f"r{i}", f"r{(i + 1) % 5}") for i in range(5)]
    row = degree_assortativity(_cooc_df(spark, pairs)).collect()[0].asDict()
    assert row == _expected_stats(pairs)
    assert row["r_num"] == 0 and row["r_den_x"] == 0


def test_dangling_objects(spark):
    trips = spark.createDataFrame(
        [
            ("u1", "a", "PERSON", "knows", "b", "PERSON"),
            ("u1", "b", "PERSON", "in", "berlin", "LOCATION"),
            ("u2", "a", "PERSON", "in", "berlin", "LOCATION"),
            # same surface, different type: still dangling (typed key)
            ("u2", "x", "ORG", "aka", "a", "ORG"),
        ],
        "url string, subj string, subj_type string, pred string, "
        "obj string, obj_type string",
    )
    got = {
        (r.obj, r.obj_type): (r.n_triples, r.n_docs)
        for r in dangling_objects(trips).collect()
    }
    # 'b' is a subject; 'a' as ORG is not a subject (only as PERSON)
    assert got == {
        ("berlin", "LOCATION"): (2, 2),
        ("a", "ORG"): (1, 1),
    }


def test_grouping_sets_vs_union_of_aggregates(spark):
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    got = {
        (r.l_returnflag, r.l_linestatus, r.gid): (r.n_rows, r.sum_qty)
        for r in E.q_rel_grouping_sets(spark, sf).collect()
    }
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    qty = F.col("l_quantity").cast("long")
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.sum(qty).alias("s")
    )
    mid = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"), F.sum(qty).alias("s")
    )
    tot = li.agg(F.count("*").alias("n"), F.sum(qty).alias("s"))
    expect = {}
    for r in fine.collect():
        expect[(r.l_returnflag, r.l_linestatus, 0)] = (r.n, r.s)
    for r in mid.collect():
        expect[(r.l_returnflag, "ALL", 1)] = (r.n, r.s)
    r = tot.collect()[0]
    expect[("ALL", "ALL", 3)] = (r.n, r.s)
    assert got == expect
