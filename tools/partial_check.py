#!/usr/bin/env python3
"""sf100 partial-oracle checker (VERDICT r13 #5).

For the operators whose FULL DuckDB replay exceeds the sandbox's ~71 GB
scratch ceiling at sf100, verify the engine dumps against a bounded,
deterministic replay:

  q_minhash_dedup / q_jaccard_prefix
      Exact Jaccard is a pure function of the two documents, so for the
      md5(doc_id) < DOC_PAIR_PREFIX sample the checker recomputes EVERY
      qualifying pair within the sample and demands set equality with the
      dump rows whose endpoints are both sampled — soundness AND
      completeness on sample x sample (banding misses a true pair with
      p ~= 5e-8, the operator's own documented bound).
  q_suffix_spans
      Per-position max-LCP equals the max over adjacent suffixes in the
      global sort (the classic suffix-array property), and is therefore a
      pure function of {positions sharing the 8-token prefix}. Two probes
      (ADVICE r14 — the emitted-docs recompute alone was circular about
      WHICH docs belong in the top-50): (1) full span-set recompute for
      the emitted docs via an 8-gram probe join — row equality with the
      dump (value soundness); (2) the full span sets of an INDEPENDENT
      md5(doc_id) sample, checked to contain nothing that out-ranks the
      dump's #50 without being in the dump (unbiased selection
      completeness).
  q_suffix_scrub
      Same probe-join LCP, for an md5(doc_id) < DOC_SCRUB_PREFIX sample;
      the span-coalesce + removal tail is spliced VERBATIM from the
      committed oracle text — full row equality on the sampled docs.
  q_textrank
      Edge weights for md5(src) < WORD_PREFIX sources replayed by per-row
      pair generation (no positional self-join) — multiset equality with
      the PartialVerify engine dump. The 5 PageRank rounds run on the
      vocab-sized graph and stay covered by the full sf10 oracle.
  q_ppmi_svd
      PPMI rows for md5(center) < WORD_PREFIX, with the marginals (nw,
      nc, nn) recomputed over the FULL corpus by linear aggregation — the
      g expression copied verbatim from the committed oracle. Multiset
      equality with the PartialVerify engine dump. The deflated power
      iterations are vocab-sized and sf10-oracled.
  q_glove_pairs (r15)
      The GloVe pair grid — co-occurrence counts, the top-GloveVocab cut
      (full-vocab mass by linear per-row pair generation) and the 6-dp
      f(x)/ln x quantization — replayed for md5-sampled center words;
      multiset equality with the PartialVerify dump. The AdaGrad rounds
      are vocab-bounded and sf1/sf10-full-oracled.
  q_rnn_pairs
      Cosine soundness for md5(vec_a) < PAIR_PREFIX dump rows (cosine is
      a pure function of the two vectors) plus rank-range sanity; the
      assignment/split/top-k structure is sf10-oracled and spec-pinned.
  q_rnn_mutual (VERDICT r14 #3)
      Rank MUTUALITY: a vector's entire rnn candidate set lives inside
      its one (cid, sub) cell, so for the cell-complete md5-sampled
      dump (PartialVerify's q_rnn_cells) the checker replays ALL
      within-cell pairs, re-derives the top-RNN_K ranks and the mutual
      filter, and demands exact (vec_a, vec_b, cosine, rank_ab, rank_ba)
      set equality with the dump restricted to sampled cells —
      conditional only on the assignment, which the sf10 full oracle
      hash-verifies.

Usage: partial_check.py <sfDir> <engineOutDir> <partialDumpDir> <outJson> [ops...]

Each op runs on a FRESH DuckDB connection (the r13 temp-leak lesson) with
PARTIAL_MEM (default 60GB) and its own temp dir.
"""
import json
import os
import shutil
import sys

import duckdb

# Sample prefixes (env-overridable for small-tier validation runs).
# WORD_PREFIX must equal PartialVerify.WordPrefix.
DOC_PAIR_PREFIX = os.environ.get("PARTIAL_DOC_PAIR_PREFIX", "1a")  # ~10% of docs -> ~1% of pair mass
DOC_SCRUB_PREFIX = os.environ.get("PARTIAL_DOC_SCRUB_PREFIX", "004")  # ~0.1% of docs for the probe-join LCP replay
WORD_PREFIX = os.environ.get("PARTIAL_WORD_PREFIX", "08")  # ~1/32 of the vocabulary
PAIR_PREFIX = os.environ.get("PARTIAL_PAIR_PREFIX", "10")  # ~6% of rnn output rows
# CELL_PREFIX must equal PartialVerify.CellPrefix (~1/64 of (cid, sub) cells)
CELL_PREFIX = os.environ.get("PARTIAL_CELL_PREFIX", "04")
# independent doc sample for the spans top-50 completeness probe (~0.2%)
SPANS_PROBE_PREFIX = os.environ.get("PARTIAL_SPANS_PROBE_PREFIX", "008")
# keep equal to CorpusQueries.GloveVocab / GloveXmax
GLOVE_VOCAB = int(os.environ.get("GLOVE_VOCAB", "400"))
GLOVE_XMAX = float(os.environ.get("GLOVE_XMAX", "20.0"))
# the rnn top-k depth — keep equal to SimilarityQueries.RnnK (ADVICE r14:
# a hardcoded bound would silently flag correct rows if the constant moves)
RNN_K = int(os.environ.get("RNN_K", "5"))

LCP_EXPR = ("coalesce(nullif(list_position("
            "list_transform(p.suf, (x,i) -> i <= len(c.suf) AND c.suf[i] = x),"
            " false), 0) - 1, least(len(p.suf), len(c.suf)))")


def connect(tag):
    con = duckdb.connect()
    con.sql(f"SET memory_limit='{os.environ.get('PARTIAL_MEM', '60GB')}'")
    if os.environ.get("PARTIAL_THREADS"):
        con.sql(f"SET threads={int(os.environ['PARTIAL_THREADS'])}")
    tmp = f"/tmp/duckdb_partial_{tag}_{os.getpid()}"
    con.sql(f"SET temp_directory='{tmp}'")
    return con, tmp


def _pq(path):
    """Plain-file or Spark-written directory parquet (the check.py rule)."""
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def table(con, sf_dir, name):
    con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM "
            f"'{_pq(os.path.join(sf_dir, name + '.parquet'))}'")


def dump_view(con, path, view):
    con.sql(f"CREATE OR REPLACE VIEW {view} AS SELECT * FROM "
            f"'{_pq(path)}'")


def sym_diff(con, a, b, cols):
    """Rows in a not in b, and in b not in a (exact-value compare)."""
    only_a = con.sql(
        f"SELECT count(*) FROM (SELECT {cols} FROM {a} EXCEPT ALL "
        f"SELECT {cols} FROM {b})").fetchone()[0]
    only_b = con.sql(
        f"SELECT count(*) FROM (SELECT {cols} FROM {b} EXCEPT ALL "
        f"SELECT {cols} FROM {a})").fetchone()[0]
    return only_a, only_b


def check_pairs(sf_dir, engine_out, query):
    """q_minhash_dedup / q_jaccard_prefix: sample-pair exact Jaccard."""
    con, tmp = connect(query)
    try:
        table(con, sf_dir, "documents")
        dump_view(con, f"{engine_out}/{query}", "dump")
        con.sql(f"""
          CREATE OR REPLACE VIEW replay AS
          WITH sdocs AS (SELECT doc_id, text FROM documents
                 WHERE md5(CAST(doc_id AS VARCHAR)) < '{DOC_PAIR_PREFIX}'),
               toks AS (SELECT doc_id,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                     q -> length(q) > 0) AS t
                 FROM sdocs),
               shing AS MATERIALIZED (SELECT doc_id,
                   unnest(list_distinct(list_transform(
                     range(1, greatest(len(t)-2, 0)+1),
                     i -> array_to_string(t[i:i+2], ' ')))) AS s
                 FROM toks),
               cnt AS (SELECT doc_id, count(*) AS n FROM shing GROUP BY 1),
               common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   count(*) AS c
                 FROM shing a JOIN shing b ON a.s = b.s AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
          SELECT doc_a, doc_b, round(c*1.0/(x.n + y.n - c), 6) AS jaccard
          FROM common JOIN cnt x ON doc_a = x.doc_id
          JOIN cnt y ON doc_b = y.doc_id
          WHERE c*1.0/(x.n + y.n - c) >= 0.8""")
        con.sql(f"""
          CREATE OR REPLACE VIEW dumpS AS
          SELECT doc_a, doc_b, jaccard FROM dump
          WHERE md5(CAST(doc_a AS VARCHAR)) < '{DOC_PAIR_PREFIX}'
            AND md5(CAST(doc_b AS VARCHAR)) < '{DOC_PAIR_PREFIX}'""")
        n_replay = con.sql("SELECT count(*) FROM replay").fetchone()[0]
        n_dump = con.sql("SELECT count(*) FROM dumpS").fetchone()[0]
        extra, missing = sym_diff(con, "dumpS", "replay",
                                  "doc_a, doc_b, jaccard")
        return {"mode": f"sample_pairs md5(doc)<'{DOC_PAIR_PREFIX}'",
                "sample_rows": n_dump, "replay_rows": n_replay,
                "dump_only": extra, "replay_only": missing,
                "match": extra == 0 and missing == 0, "err": None}
    finally:
        con.close(); shutil.rmtree(tmp, ignore_errors=True)


def _lcp_prefix(doc_filter):
    """Shared prefix: full-corpus 8-gram stream, probe docs via
    doc_filter, per-position max-LCP >= 8 as g2, sampled docs as t."""
    return f"""
      WITH tall AS (SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\\s+'),
               x -> length(x) > 0) AS toks
           FROM documents),
         t AS MATERIALIZED (SELECT doc_id, toks FROM tall
           WHERE {doc_filter}),
         ppos AS (SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 8 + 1, 0) + 1)) AS pos
           FROM t),
         probe AS MATERIALIZED (SELECT doc_id, pos,
             toks[pos : pos + 30 - 1] AS suf,
             array_to_string(toks[pos : pos + 8 - 1], ' ') AS g8
           FROM ppos),
         pg AS MATERIALIZED (SELECT DISTINCT g8 FROM probe),
         cpos AS (SELECT doc_id, toks,
             unnest(range(1, greatest(len(toks) - 8 + 1, 0) + 1)) AS pos
           FROM tall),
         -- gram-filter FIRST (an 8-token string per corpus position is
         -- the linear pass); the 30-token suffix slice is built only for
         -- the few positions that share a probe gram
         cand0 AS MATERIALIZED (SELECT doc_id, pos, g8 FROM (
             SELECT doc_id, pos,
               array_to_string(toks[pos : pos + 8 - 1], ' ') AS g8
             FROM cpos) x
           WHERE g8 IN (SELECT g8 FROM pg)),
         cand AS MATERIALIZED (SELECT c.doc_id, c.pos, c.g8,
             t2.toks[c.pos : c.pos + 30 - 1] AS suf
           FROM cand0 c JOIN tall t2 ON c.doc_id = t2.doc_id),
         mx AS (SELECT p.doc_id, p.pos, max({LCP_EXPR}) AS lcp
           FROM probe p JOIN cand c ON p.g8 = c.g8
             AND NOT (p.doc_id = c.doc_id AND p.pos = c.pos)
           GROUP BY 1, 2),
         g2 AS (SELECT doc_id, pos, lcp FROM mx WHERE lcp >= 8)"""


def check_suffix(sf_dir, engine_out, query, oracle_sql):
    """q_suffix_spans / q_suffix_scrub: probe-join LCP + the committed
    oracle's span tail spliced verbatim from `isl AS` onward.

    q_suffix_spans runs TWO probes (ADVICE r14: the emitted-docs recompute
    alone is circular — its probe set came from the dump, so a dump that
    picked the wrong top-50 docs with per-doc-correct values would pass):
      1. emitted-docs full recompute — value soundness on every dump row;
      2. an md5(doc_id) sample drawn INDEPENDENTLY of the dump, whose
         full span sets are replayed and checked to contain nothing that
         ranks strictly before the dump's #50 under (span_tokens DESC,
         doc_id, span_start) without being in the dump — unbiased
         completeness evidence for the top-50 selection itself."""
    con, tmp = connect(query)
    try:
        table(con, sf_dir, "documents")
        dump_view(con, f"{engine_out}/{query}", "dump")
        tail = oracle_sql[oracle_sql.find("isl AS"):]
        if query == "q_suffix_spans":
            doc_filter = "doc_id IN (SELECT DISTINCT doc_id FROM dump)"
            cols = "doc_id, span_start, span_end, span_tokens, n_positions"
            dump_sel = f"SELECT {cols} FROM dump"
        else:
            doc_filter = (f"md5(CAST(doc_id AS VARCHAR)) < "
                          f"'{DOC_SCRUB_PREFIX}'")
            cols = ("doc_id, n_tokens, n_removed, n_kept, kept_frac, "
                    "cleaned_fp")
            dump_sel = (f"SELECT {cols} FROM dump WHERE "
                        f"md5(CAST(doc_id AS VARCHAR)) < "
                        f"'{DOC_SCRUB_PREFIX}'")
        con.sql("CREATE OR REPLACE VIEW replay AS "
                + _lcp_prefix(doc_filter) + ", " + tail)
        con.sql(f"CREATE OR REPLACE VIEW dumpS AS {dump_sel}")
        n_replay = con.sql("SELECT count(*) FROM replay").fetchone()[0]
        n_dump = con.sql("SELECT count(*) FROM dumpS").fetchone()[0]
        extra, missing = sym_diff(con, "dumpS", "replay", cols)
        beat = 0
        if query == "q_suffix_spans":
            # independent completeness probe: replay the FULL span set of
            # an md5 doc sample (no dump influence on the probe set) and
            # count spans that would out-rank the dump's worst row yet are
            # absent from the dump. Strip the top-50 LIMIT — the sample's
            # spans compete against the dump's cut, not among themselves.
            assert tail.rstrip().endswith("LIMIT 50"), tail[-60:]
            tail_all = tail.rstrip()[: -len("LIMIT 50")]
            con.sql("CREATE OR REPLACE VIEW sreplay AS "
                    + _lcp_prefix(f"md5(CAST(doc_id AS VARCHAR)) < "
                                  f"'{SPANS_PROBE_PREFIX}'") + ", " + tail_all)
            if n_dump < 50:
                # an under-full top-50 must already contain EVERY span —
                # any sampled span missing from the dump is a violation
                beat = con.sql(f"""
                  SELECT count(*) FROM (SELECT {cols} FROM sreplay
                    EXCEPT ALL SELECT {cols} FROM dumpS)""").fetchone()[0]
            else:
                wt, wd, ws = con.sql(
                    "SELECT span_tokens, doc_id, span_start FROM dumpS "
                    "ORDER BY span_tokens ASC, doc_id DESC, span_start DESC "
                    "LIMIT 1").fetchone()
                beat = con.sql(f"""
                  SELECT count(*) FROM (SELECT {cols} FROM sreplay
                      EXCEPT ALL SELECT {cols} FROM dumpS) s
                  WHERE s.span_tokens > {wt}
                     OR (s.span_tokens = {wt} AND s.doc_id < {wd})
                     OR (s.span_tokens = {wt} AND s.doc_id = {wd}
                         AND s.span_start < {ws})""").fetchone()[0]
        mode = (f"emitted_docs_full_recompute + independent sample "
                f"md5(doc)<'{SPANS_PROBE_PREFIX}' top-50 completeness"
                if query == "q_suffix_spans" else
                f"sample_docs md5(doc)<'{DOC_SCRUB_PREFIX}'")
        return {"mode": mode,
                "sample_rows": n_dump, "replay_rows": n_replay,
                "dump_only": extra, "replay_only": missing,
                "sample_beats_cut": beat,
                "match": extra == 0 and missing == 0 and beat == 0,
                "err": None}
    finally:
        con.close(); shutil.rmtree(tmp, ignore_errors=True)


def check_textrank(sf_dir, partial_dir):
    con, tmp = connect("textrank")
    try:
        table(con, sf_dir, "documents")
        dump_view(con, f"{partial_dir}/q_textrank_partial", "dump")
        # per-row pair generation (the linear formulation; the committed
        # oracle's positional self-join is what busts the tier)
        con.sql(f"""
          CREATE OR REPLACE VIEW replay AS
          WITH t AS (SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                 q -> length(q) > 0) AS t
               FROM documents),
             pp AS (SELECT t, unnest(range(1, len(t)+1)) AS i FROM t),
             pair AS (SELECT t[i] AS src, t[i+o] AS dst
               FROM pp, (VALUES (1), (2)) v(o)
               WHERE i + o <= len(t) AND t[i] != t[i+o])
          SELECT src, dst, CAST(count(*) AS DOUBLE) AS ew FROM (
            SELECT src, dst FROM pair WHERE md5(src) < '{WORD_PREFIX}'
            UNION ALL
            SELECT dst AS src, src AS dst FROM pair
            WHERE md5(dst) < '{WORD_PREFIX}')
          GROUP BY 1, 2""")
        n_replay = con.sql("SELECT count(*) FROM replay").fetchone()[0]
        n_dump = con.sql("SELECT count(*) FROM dump").fetchone()[0]
        extra, missing = sym_diff(con, "dump", "replay", "src, dst, ew")
        return {"mode": f"edge_weights md5(src)<'{WORD_PREFIX}'",
                "sample_rows": n_dump, "replay_rows": n_replay,
                "dump_only": extra, "replay_only": missing,
                "match": extra == 0 and missing == 0, "err": None}
    finally:
        con.close(); shutil.rmtree(tmp, ignore_errors=True)


def check_ppmi(sf_dir, partial_dir):
    con, tmp = connect("ppmi")
    try:
        table(con, sf_dir, "documents")
        dump_view(con, f"{partial_dir}/q_ppmi_svd_partial", "dump")
        # marginals over the FULL corpus by linear per-row generation;
        # the g expression is the committed oracle's, verbatim
        con.sql(f"""
          CREATE OR REPLACE VIEW replay AS
          WITH t AS (SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                 q -> length(q) > 0) AS t
               FROM documents),
             pp AS (SELECT t, unnest(range(1, len(t)+1)) AS i FROM t),
             pair AS (SELECT t[i] AS x, t[i+o] AS y
               FROM pp, (VALUES (1), (2)) v(o) WHERE i + o <= len(t)),
             bd AS (SELECT x AS center, y AS context FROM pair
               UNION ALL SELECT y AS center, x AS context FROM pair),
             rowm AS (SELECT center, count(*) AS nw FROM bd GROUP BY 1),
             tot AS (SELECT count(*) AS nn FROM bd),
             coocS AS (SELECT center, context, count(*) AS n FROM bd
               WHERE md5(center) < '{WORD_PREFIX}' GROUP BY 1, 2)
          SELECT center AS w, context AS c, CAST(g AS DOUBLE) AS g FROM (
            SELECT c.center, c.context,
              CAST(round(ln((CAST(c.n AS DOUBLE) * CAST(t.nn AS DOUBLE)) /
                (CAST(r1.nw AS DOUBLE) * CAST(r2.nw AS DOUBLE))), 6)
                AS DECIMAL(18,6)) AS g
            FROM coocS c
            JOIN rowm r1 ON c.center = r1.center
            JOIN rowm r2 ON c.context = r2.center
            CROSS JOIN tot t) WHERE g > 0.0""")
        n_replay = con.sql("SELECT count(*) FROM replay").fetchone()[0]
        n_dump = con.sql("SELECT count(*) FROM dump").fetchone()[0]
        extra, missing = sym_diff(con, "dump", "replay", "w, c, g")
        return {"mode": f"ppmi_rows md5(center)<'{WORD_PREFIX}'",
                "sample_rows": n_dump, "replay_rows": n_replay,
                "dump_only": extra, "replay_only": missing,
                "match": extra == 0 and missing == 0, "err": None}
    finally:
        con.close(); shutil.rmtree(tmp, ignore_errors=True)


def check_glove(sf_dir, partial_dir):
    """q_glove_embed corpus-sized half (the q_ppmi_svd pattern): the
    capped-vocab pair grid — co-occurrence counts, the top-GloveVocab cut
    (full-vocab mass computed by LINEAR per-row pair generation), and the
    6-dp f(x)/ln x quantization — replayed for md5-sampled center words
    and compared as a multiset against the PartialVerify dump. The AdaGrad
    training rounds run on vocab-bounded frames and are covered by the
    sf1/sf10 full oracle."""
    con, tmp = connect("glove")
    try:
        table(con, sf_dir, "documents")
        dump_view(con, f"{partial_dir}/q_glove_pairs_partial", "dump")
        con.sql(f"""
          CREATE OR REPLACE VIEW replay AS
          WITH t AS (SELECT list_filter(regexp_split_to_array(text, '\\s+'),
                 q -> length(q) > 0) AS t
               FROM documents),
             pp AS (SELECT t, unnest(range(1, len(t)+1)) AS i FROM t),
             pair AS (SELECT t[i] AS x, t[i+o] AS y
               FROM pp, (VALUES (1), (2)) v(o) WHERE i + o <= len(t)),
             bd AS (SELECT x AS center, y AS context FROM pair
               UNION ALL SELECT y AS center, x AS context FROM pair),
             vocab AS MATERIALIZED (SELECT center AS w
               FROM (SELECT center, count(*) AS nw FROM bd GROUP BY 1)
               ORDER BY nw DESC, center LIMIT {GLOVE_VOCAB}),
             coocS AS (SELECT center, context, count(*) AS n FROM bd
               WHERE md5(center) < '{WORD_PREFIX}' GROUP BY 1, 2)
          SELECT c.center AS i, c.context AS j,
            CAST(CAST(round(CASE WHEN c.n >= {GLOVE_XMAX} THEN 1.0
                ELSE pow(CAST(c.n AS DOUBLE) / {GLOVE_XMAX}, 0.75) END, 6)
              AS DECIMAL(18,6)) AS DOUBLE) AS fx,
            CAST(CAST(round(ln(CAST(c.n AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS DOUBLE) AS lx
          FROM coocS c
          JOIN vocab vi ON c.center = vi.w
          JOIN vocab vj ON c.context = vj.w""")
        n_replay = con.sql("SELECT count(*) FROM replay").fetchone()[0]
        n_dump = con.sql("SELECT count(*) FROM dump").fetchone()[0]
        extra, missing = sym_diff(con, "dump", "replay", "i, j, fx, lx")
        return {"mode": f"glove_pair_grid md5(center)<'{WORD_PREFIX}' "
                        f"vocab_top_{GLOVE_VOCAB}",
                "sample_rows": n_dump, "replay_rows": n_replay,
                "dump_only": extra, "replay_only": missing,
                "match": extra == 0 and missing == 0, "err": None}
    finally:
        con.close(); shutil.rmtree(tmp, ignore_errors=True)


def check_rnn(sf_dir, engine_out):
    con, tmp = connect("rnn")
    try:
        table(con, sf_dir, "embeddings")
        dump_view(con, f"{engine_out}/q_rnn_pairs", "dump")
        bad = con.sql(f"""
          WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                 sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                   CAST(embedding AS DOUBLE[]))) AS vn
               FROM embeddings),
             s AS (SELECT * FROM dump
               WHERE md5(CAST(vec_a AS VARCHAR)) < '{PAIR_PREFIX}')
          SELECT count(*) FROM s
          JOIN emb a ON s.vec_a = a.vec_id
          JOIN emb b ON s.vec_b = b.vec_id
          WHERE s.cosine != round(
              list_dot_product(a.v, b.v) / (a.vn * b.vn), 6)
            OR s.rank_ab < 1 OR s.rank_ab > {RNN_K}
            OR s.rank_ba < 1 OR s.rank_ba > {RNN_K}
            OR s.vec_a >= s.vec_b""").fetchone()[0]
        n = con.sql(f"""SELECT count(*) FROM dump
          WHERE md5(CAST(vec_a AS VARCHAR)) < '{PAIR_PREFIX}'""").fetchone()[0]
        return {"mode": f"cosine_soundness md5(vec_a)<'{PAIR_PREFIX}'",
                "sample_rows": n, "replay_rows": n,
                "dump_only": bad, "replay_only": 0,
                "match": bad == 0, "err": None}
    finally:
        con.close(); shutil.rmtree(tmp, ignore_errors=True)


def check_rnn_mutual(sf_dir, engine_out, partial_dir):
    """q_rnn_pairs rank mutuality (VERDICT r14 #3): a vector's ENTIRE rnn
    candidate set lives inside its one (cid, sub) cell, so for the
    cell-complete sample dumped by PartialVerify (every member of each
    md5-sampled cell) the within-cell top-K ranks and the mutual filter
    are replayed EXACTLY — completeness AND soundness on (vec_a, vec_b,
    cosine, rank_ab, rank_ba) for every dump row whose endpoints lie in a
    sampled cell. Conditional on the assignment itself, which the full
    sf10 oracle hash-verifies; the replay is linear in the sample (cells
    are occupancy-bounded by the engine's split)."""
    con, tmp = connect("rnn_mutual")
    try:
        table(con, sf_dir, "embeddings")
        dump_view(con, f"{engine_out}/q_rnn_pairs", "dump")
        dump_view(con, f"{partial_dir}/q_rnn_cells_partial", "cells")
        n_cells, n_members = con.sql(
            "SELECT count(DISTINCT (cid, sub)), count(*) FROM cells"
        ).fetchone()
        con.sql(f"""
          CREATE OR REPLACE VIEW replay AS
          WITH m AS MATERIALIZED (
              SELECT c.vec_id, c.cid, c.sub,
                     CAST(e.embedding AS DOUBLE[]) AS v,
                     sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                       CAST(e.embedding AS DOUBLE[]))) AS vn
              FROM cells c JOIN embeddings e ON c.vec_id = e.vec_id),
            pair AS (
              SELECT a.vec_id AS va, b.vec_id AS vb,
                     round(list_dot_product(a.v, b.v) / (a.vn * b.vn), 6)
                       AS cos
              FROM m a JOIN m b
                ON a.cid = b.cid AND a.sub = b.sub
                AND a.vec_id != b.vec_id),
            ranked AS (
              SELECT va, vb, cos,
                     row_number() OVER (PARTITION BY va
                       ORDER BY cos DESC, vb ASC) AS rn
              FROM pair),
            top AS (SELECT * FROM ranked WHERE rn <= {RNN_K})
          SELECT x.va AS vec_a, x.vb AS vec_b, x.cos AS cosine,
                 x.rn AS rank_ab, y.rn AS rank_ba
          FROM top x JOIN top y ON x.va = y.vb AND x.vb = y.va
          WHERE x.va < x.vb""")
        # the dump restricted to sampled cells: vec_a membership suffices
        # (pairs only form within a cell, so vec_b sits in the same one)
        con.sql("""
          CREATE OR REPLACE VIEW dumpS AS
          SELECT d.vec_a, d.vec_b, d.cosine, d.rank_ab, d.rank_ba
          FROM dump d JOIN (SELECT DISTINCT vec_id FROM cells) c
            ON d.vec_a = c.vec_id""")
        cols = "vec_a, vec_b, cosine, rank_ab, rank_ba"
        n_replay = con.sql("SELECT count(*) FROM replay").fetchone()[0]
        n_dump = con.sql("SELECT count(*) FROM dumpS").fetchone()[0]
        extra, missing = sym_diff(con, "dumpS", "replay", cols)
        return {"mode": "rank_mutuality cell-complete "
                        f"md5(cid:sub)<'{CELL_PREFIX}' k={RNN_K}",
                "sample_cells": n_cells, "sample_members": n_members,
                "sample_rows": n_dump, "replay_rows": n_replay,
                "dump_only": extra, "replay_only": missing,
                "match": extra == 0 and missing == 0, "err": None}
    finally:
        con.close(); shutil.rmtree(tmp, ignore_errors=True)


def main():
    sf_dir, engine_out, partial_dir, out_json = sys.argv[1:5]
    ops = sys.argv[5:] or ["q_minhash_dedup", "q_jaccard_prefix",
                           "q_suffix_spans", "q_suffix_scrub",
                           "q_textrank", "q_ppmi_svd", "q_rnn_pairs"]
    oracle_sql = {}
    for cand in (engine_out, "/tmp/out_sf100"):
        p = os.path.join(cand, "oracle_sql.json")
        if os.path.exists(p):
            oracle_sql = json.load(open(p))
            break
    results = {}
    for op in ops:
        print(f"[partial] {op} ...", flush=True)
        try:
            if op in ("q_minhash_dedup", "q_jaccard_prefix"):
                r = check_pairs(sf_dir, engine_out, op)
            elif op in ("q_suffix_spans", "q_suffix_scrub"):
                r = check_suffix(sf_dir, engine_out, op, oracle_sql[op])
            elif op == "q_textrank":
                r = check_textrank(sf_dir, partial_dir)
            elif op == "q_ppmi_svd":
                r = check_ppmi(sf_dir, partial_dir)
            elif op == "q_glove_pairs":
                r = check_glove(sf_dir, partial_dir)
            elif op == "q_rnn_pairs":
                r = check_rnn(sf_dir, engine_out)
            elif op == "q_rnn_mutual":
                r = check_rnn_mutual(sf_dir, engine_out, partial_dir)
            else:
                r = {"match": False, "err": f"unknown op {op}"}
        except Exception as e:  # noqa: BLE001 — recorded per-op
            r = {"match": False, "err": f"{type(e).__name__}: {e}"}
        r["partial_oracle"] = True
        results[op] = r
        tag = "ok" if r.get("match") else "FAIL"
        print(f"  [{tag}] {op}: {r}", flush=True)
    json.dump(results, open(out_json, "w"), indent=1, sort_keys=True)
    npass = sum(1 for r in results.values() if r.get("match"))
    print(f"wrote {out_json}\nPASS {npass} FAIL {len(results) - npass}")


if __name__ == "__main__":
    main()
