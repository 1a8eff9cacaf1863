#!/usr/bin/env python
"""Citation-impact analytics with the library facade (api.py).

Reads a reference-grain table (one row per citation: citing paper ->
cited paper, with the cited paper's author), then computes the three
impact views a bibliometrics team asks for — author h-index, paper
PageRank over the citation graph, and a length-weighted deterministic
sample of papers for manual review — expressed entirely against
``api.*`` DataFrame functions (no benchmark lake layout).

Usage:
    python examples/citation_analytics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def analyze(spark, refs, papers):
    """refs(citing, cited, author) + papers(paper, n_pages) ->
    dict of result DataFrames."""
    from citeconnect_datapipeline_spark import api

    # 1. author impact: h-index over (author, cited-paper) references
    h = api.graph.h_index(refs, "author", "cited").orderBy(
        F.desc("h_index"), "entity"
    )
    # 2. paper importance: PageRank over the citation edge list
    pr = api.graph.pagerank(
        refs.select(
            F.col("citing").alias("src"), F.col("cited").alias("dst")
        )
    ).orderBy(F.desc("rank"))
    # 3. review sample: longer papers proportionally likelier, but the
    #    draw is deterministic (md5-keyed) so re-runs agree
    sample = api.curation.weighted_sample(papers, "n_pages", "paper", k=3)
    return {"h_index": h, "pagerank": pr, "review_sample": sample}


def main() -> None:
    from citeconnect_datapipeline_spark.session import get_spark

    spark = get_spark(app_name="citation-analytics-example")
    refs = spark.createDataFrame(
        [
            # paper p1 (by alice) is cited by three papers; p2 (alice)
            # by two; bob's q1 by one — alice h=2, bob h=1
            ("c1", "p1", "alice"),
            ("c2", "p1", "alice"),
            ("c3", "p1", "alice"),
            ("c1", "p2", "alice"),
            ("c2", "p2", "alice"),
            ("c3", "q1", "bob"),
            ("p1", "q1", "bob"),
        ],
        "citing string, cited string, author string",
    )
    papers = spark.createDataFrame(
        [("p1", 12), ("p2", 4), ("q1", 30), ("c1", 8), ("c2", 6)],
        "paper string, n_pages long",
    )
    out = analyze(spark, refs, papers)
    for name, df in out.items():
        print(f"== {name}")
        df.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
