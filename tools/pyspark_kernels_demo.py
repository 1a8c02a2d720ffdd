#!/usr/bin/env python3
"""PySpark binding demo for the graft engine (VERDICT r5 item 4).

SURVEY.md waives the reference's Python BSP binding
(/root/reference/python/BSPPeer.py:27-180) to PySpark; this script
DEMONSTRATES the waiver: a plain PySpark session loads the engine jar,
activates `graft.GraftExtensions` via spark.sql.extensions, reads the
same parquet tables every declared query uses, and calls the
SQL-registered native kernels (vec_dot / vec_cosine / minhash_sig /
simhash_sig / distinct_ngrams) from Python with zero Python UDFs — the
kernels run as codegen'd Catalyst expressions on the JVM, Python is
orchestration only (exactly the split a Hama streaming-job port needs).

Run:  sbt package && python3 tools/pyspark_kernels_demo.py [sfDir]
Exits non-zero if any smoke check fails.
"""
import glob
import os
import sys

from pyspark.sql import SparkSession


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jars = sorted(glob.glob(os.path.join(repo, "target", "scala-2.13", "*.jar")))
    if not jars:
        sys.exit("no engine jar found — run `sbt package` first")

    spark = (SparkSession.builder
             .appName("graft-pyspark-demo")
             .master("local[4]")
             .config("spark.jars", jars[-1])
             .config("spark.sql.extensions", "graft.GraftExtensions")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.legacy.parquet.nanosAsLong", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb.createOrReplaceTempView("embeddings")
    docs.createOrReplaceTempView("documents")

    failures = []

    def check(name, cond, detail=""):
        print(("ok   " if cond else "FAIL ") + name + (" " + detail if detail else ""))
        if not cond:
            failures.append(name)

    # 1. native vec_dot/vec_cosine from SQL: self-cosine is exactly 1
    row = spark.sql("""
        SELECT COUNT(*) AS n,
               MIN(vec_cosine(embedding, embedding)) AS lo,
               MAX(vec_cosine(embedding, embedding)) AS hi,
               MAX(ABS(vec_dot(embedding, embedding))) AS mx
        FROM embeddings""").head()
    check("vec_cosine self == 1", row.n > 0 and abs(row.lo - 1.0) < 1e-6
          and abs(row.hi - 1.0) < 1e-6, f"n={row.n}")
    check("vec_dot self > 0", row.mx > 0)

    # 2. the cast-elision optimizer rule is active: casting the float
    # embedding to array<double> must leave NO Cast under vec_dot
    plan = spark.sql("""
        SELECT vec_dot(CAST(embedding AS ARRAY<DOUBLE>), embedding) AS d
        FROM embeddings""")._jdf.queryExecution().optimizedPlan().toString()
    check("VecDotCastElision fired", "cast(" not in plan.lower(), plan.splitlines()[0])

    # 3. minhash_sig: k-wide signature, identical tokens -> identical sig
    row = spark.sql("""
        WITH t AS (SELECT doc_id, split(lower(text), ' ') AS tk FROM documents
                   WHERE length(text) > 0 LIMIT 500)
        SELECT COUNT(*) AS n,
               MIN(size(minhash_sig(tk, 3, 16))) AS klo,
               MAX(size(minhash_sig(tk, 3, 16))) AS khi,
               SUM(CASE WHEN minhash_sig(tk, 3, 16) = minhash_sig(tk, 3, 16)
                   THEN 1 ELSE 0 END) AS stable
        FROM t""").head()
    check("minhash_sig width == 16", row.n > 0 and row.klo == 16 and row.khi == 16)
    check("minhash_sig deterministic", row.stable == row.n)

    # 4. simhash + distinct_ngrams compose in one SQL expression
    row = spark.sql("""
        WITH t AS (SELECT split(lower(text), ' ') AS tk FROM documents
                   WHERE length(text) > 0 LIMIT 200)
        SELECT COUNT(DISTINCT simhash_sig(tk)) AS sims,
               MAX(size(distinct_ngrams(tk, 3))) AS grams FROM t""").head()
    check("simhash/distinct_ngrams usable from SQL", row.sims > 0 and row.grams > 0)

    # 4b. hamming_bits over simhash signatures — the banded-verify kernel
    row = spark.sql("""
        WITH t AS (SELECT simhash_sig(split(lower(text), ' ')) AS sig
                   FROM documents WHERE length(text) > 0 LIMIT 50)
        SELECT MAX(hamming_bits(a.sig, b.sig)) AS mx,
               MIN(hamming_bits(a.sig, a.sig)) AS zero
        FROM t a CROSS JOIN t b""").head()
    check("hamming_bits usable from SQL", row.zero == 0 and 0 <= row.mx <= 64)

    # 4c. morton2 — the Z-order interleave behind OPTIMIZE ZORDER BY,
    # checked against a hand-computed code: x=5 (0101) on even bits,
    # y=3 (0011) on odd bits -> z = 0b00011011 = 27
    row = spark.sql("SELECT morton2(5, 3, 4) AS z, morton2(0, 0, 4) AS z0").head()
    check("morton2 usable from SQL", row.z == 27 and row.z0 == 0)

    # 5. mapInPandas over BINARY payloads — the multimodal decode
    # plumbing (schema, partitioning, batch shape) with a deterministic
    # stand-in for the codec: each Arrow batch of (doc_id, payload)
    # yields (doc_id, n_bytes, checksum). A real image/audio decoder
    # slots into decode() unchanged.
    import pandas as pd
    from pyspark.sql.types import StructType, StructField, LongType

    payloads = spark.sql(
        "SELECT doc_id, CAST(encode(text, 'utf-8') AS BINARY) AS payload "
        "FROM documents").repartition(4)

    def decode(batches):
        for pdf in batches:  # one pandas DataFrame per Arrow batch
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len),
                "checksum": pdf["payload"].map(lambda b: sum(b[:64]) if b else 0),
            })

    out_schema = StructType([
        StructField("doc_id", LongType()), StructField("n_bytes", LongType()),
        StructField("checksum", LongType())])
    decoded = payloads.mapInPandas(decode, out_schema)
    decoded.createOrReplaceTempView("decoded")
    row = spark.sql("""
        SELECT COUNT(*) AS n, SUM(CASE WHEN d.n_bytes = length(doc.text)
                 THEN 1 ELSE 0 END) AS len_ok
        FROM decoded d JOIN documents doc ON d.doc_id = doc.doc_id""").head()
    check("mapInPandas batch decode", row.n > 0 and row.len_ok == row.n,
          f"docs={row.n}")

    # 6. a declared engine query runs untouched from Python: the Scala
    # query registry is reachable through the JVM gateway, so a PySpark
    # caller can run ANY SparkEntry row without porting it
    jdf = (spark._jvm.graft.SparkEntry.queries().apply("q_agg_q1")
           .apply(spark._jsparkSession, sf_dir))
    from pyspark.sql import DataFrame
    q1 = DataFrame(jdf, spark)
    check("SparkEntry.queries from Python", q1.count() > 0,
          f"cols={q1.columns}")

    spark.stop()
    if failures:
        sys.exit(f"{len(failures)} smoke check(s) failed: {failures}")
    print("all PySpark kernel smoke checks passed")


if __name__ == "__main__":
    main()
