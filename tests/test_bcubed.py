"""B-cubed clustering evaluation (er.bcubed_score) tests."""

from unsupervised_ner_spark.pipeline.er import bcubed_score


def _assign(spark, rows):
    return spark.createDataFrame(rows, "item long, pred string, truth string")


def test_bcubed_textbook_example(spark):
    # truth {1,2} {3,4,5}; predicted {1,2,3} {4,5}
    rows = [
        (1, "A", "T1"), (2, "A", "T1"), (3, "A", "T2"),
        (4, "B", "T2"), (5, "B", "T2"),
    ]
    r = bcubed_score(_assign(spark, rows)).collect()[0]
    # per-item ppm floors: P = (2*666666 + 333333 + 2*1000000) div 5
    assert r.n_items == 5
    assert r.b3_precision_ppm == 733333
    assert r.b3_recall_ppm == 733333
    assert r.b3_f1_ppm == 733333


def test_bcubed_perfect_and_degenerate(spark):
    # perfect clustering
    rows = [(1, "A", "T1"), (2, "A", "T1"), (3, "B", "T2")]
    r = bcubed_score(_assign(spark, rows)).collect()[0]
    assert (r.b3_precision_ppm, r.b3_recall_ppm, r.b3_f1_ppm) == (
        1_000_000, 1_000_000, 1_000_000,
    )
    # everything in one predicted cluster vs singleton truths:
    # precision per item = 1/3, recall = 1
    rows = [(1, "A", "T1"), (2, "A", "T2"), (3, "A", "T3")]
    r = bcubed_score(_assign(spark, rows)).collect()[0]
    assert r.b3_precision_ppm == 333333
    assert r.b3_recall_ppm == 1_000_000
    # F1 = 2*333333*1e6 div 1333333
    assert r.b3_f1_ppm == 2 * 333333 * 1_000_000 // 1_333_333
