"""salted_join: results identical to a plain join on a skewed toy graph."""

from pyspark.sql import functions as F

from linkgraph import skew


def test_salted_join_equals_plain_join(spark):
    # one mega-hub (id 0, degree 50) + a uniform tail
    edges = spark.createDataFrame(
        [(0, i + 1) for i in range(50)] + [(i, i + 1) for i in range(1, 20)],
        "src long, dst long",
    )
    state = spark.createDataFrame(
        [(i, float(i) / 10) for i in range(60)], "id long, rank double"
    )
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    hubs = skew.hub_ids(deg, threshold=10)
    assert hubs.count() == 1

    plain = edges.join(state.withColumnRenamed("id", "src"), "src").select(
        "src", "dst", "rank"
    )
    salted = skew.salted_join(
        edges, state.withColumnRenamed("id", "src"), "src", hubs, num_salts=4
    ).select("src", "dst", "rank")
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )

    # aggregation over the salted join also matches (re-combine property)
    a = salted.groupBy("src").agg(F.sum("rank").alias("s")).collect()
    b = plain.groupBy("src").agg(F.sum("rank").alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
