"""Corpus-hygiene operators for training-data pipelines: PII
redaction, URL normalization, and paragraph-level exact deduplication
(the CCNet shape).

All hot paths are Catalyst expressions (JVM-side, whole-stage codegen)
— no Python UDFs. Regexes are restricted to the Java-regex ∩ RE2
common subset so the DuckDB oracles run the IDENTICAL patterns; the
test corpus carries no PII/URLs, so the driver queries synthesize both
deterministically from doc_id (the zero-fixtures tradition of
synthesize_media) and both engines recompute the same augmented text
symbolically.

Reference parity anchor: the reference engine (jsoup) cleans documents
(org/jsoup/safety/Cleaner.java) but has no corpus-level hygiene; these
operators extend that contract to the LLM-pipeline tier (SURVEY.md
LLM-pipeline section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Java-regex ∩ RE2 subset — mirrored VERBATIM in the oracle SQL
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def with_synth_pii(documents: DataFrame) -> DataFrame:
    """Append deterministic doc_id-derived PII (email + phone, IP on
    even ids) to `text` -> column `aug` (both engines can recompute the
    same string symbolically)."""
    did = F.col("doc_id").cast("long")
    tld = F.element_at(F.array(F.lit("com"), F.lit("net"), F.lit("org")),
                       (did % 3 + 1).cast("int"))
    email = F.concat(F.lit("user"), (did % 1000).cast("string"),
                     F.lit("@example."), tld)
    phone = F.concat(F.lit("+1-555-"),
                     F.lpad((did % 10000).cast("string"), 4, "0"))
    ip = F.when(did % 2 == 0, F.concat(
        F.lit(" from 10."), (did % 256).cast("string"),
        F.lit(".0."), ((did * 7) % 256).cast("string"))).otherwise(F.lit(""))
    aug = F.concat(F.col("text"), F.lit(" contact "), email,
                   F.lit(" or call "), phone, ip)
    return documents.withColumn("aug", aug)


def pii_scrub(documents: DataFrame,
              text_col: str = "aug") -> DataFrame:
    """Detect + redact emails / phone numbers / IPv4 addresses.

    Pure Catalyst regexp_count / regexp_replace in whole-stage codegen,
    zero exchanges — a map-only stage at any scale. Redaction order
    (email -> phone -> IP) is part of the contract."""
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "[EMAIL]"),
            PHONE_RE, "[PHONE]"),
        IP_RE, "[IP]")
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count(t, F.lit(IP_RE)).alias("n_ips"),
        redacted.alias("redacted"),
        F.length(redacted).alias("redacted_len"),
    )


def with_synth_url(documents: DataFrame) -> DataFrame:
    """Deterministic messy URL per doc (mixed-case scheme/host, www
    prefix, tracking params, fragment) -> column `url`."""
    did = F.col("doc_id").cast("long")
    return documents.withColumn("url", F.concat(
        F.lit("HTTPS://WWW."), F.upper(F.col("source")),
        F.lit(".Example.COM/"), F.col("lang"),
        F.lit("/page-"), (did % 7).cast("string"),
        F.lit("?utm_source=feed&id="), did.cast("string"),
        F.lit("&ref=r"), (did % 3).cast("string"),
        F.lit("#sec"), (did % 5).cast("string")))


def url_normalize(documents: DataFrame,
                  url_col: str = "url") -> DataFrame:
    """Crawl-frontier URL normalization: lowercase host, strip a
    leading www., drop the fragment and tracking params (keep only
    `id`), extract the registered domain. Pure Catalyst regex (shared
    Java/RE2 subset), zero exchanges, map-only at any scale."""
    u = F.col(url_col)
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?#]+)", 1))
    host_norm = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(u, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    id_param = F.regexp_extract(query, r"(?:^|&)(id=[0-9]+)", 1)
    norm = F.concat(
        F.lit("https://"), host_norm, path,
        F.when(id_param != "", F.concat(F.lit("?"), id_param))
        .otherwise(F.lit("")))
    return documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        host_norm.alias("host"),
        F.regexp_extract(host_norm, r"([^.]+\.[^.]+)$", 1)
        .alias("registered_domain"),
        norm.alias("norm_url"),
    )


def paragraph_dedup(documents: DataFrame,
                    chunk_words: int = 3) -> DataFrame:
    """Paragraph-level exact dedup (the CCNet shape): split each doc
    into word chunks ("paragraphs"), count every paragraph's corpus
    frequency, and report per doc how much text survives removing
    corpus-duplicated paragraphs.

    Scale shape: explode -> groupBy(md5(para)) with map-side combine
    (collapses the heavy-tailed paragraph distribution BEFORE the
    shuffle — the skew-safe alternative to a count() window over the
    raw paragraph stream) -> co-partitioned join back -> one
    groupBy(doc_id). Two shuffles total, both on hashed keys; at
    100 TB the md5 keys keep the exchange narrow (16 bytes vs full
    paragraph strings)."""
    k = chunk_words
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(k)).cast("int")
    paras = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * k + 1, k), " "))
    exploded = documents.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(paras).alias("para"),
    ).select("doc_id", F.md5("para").alias("para_key"),
             F.length("para").alias("para_len"))
    freq = exploded.groupBy("para_key").agg(F.count("*").alias("freq"))
    joined = exploded.join(freq, "para_key")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum((F.col("freq") > 1).cast("int")).alias("n_dup_paras"),
        F.sum(F.when(F.col("freq") == 1, F.col("para_len"))
              .otherwise(F.lit(0))).alias("retained_chars"),
    )
