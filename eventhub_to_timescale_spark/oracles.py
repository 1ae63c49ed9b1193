"""DuckDB oracle SQL for the LLM-data-pipeline operators.

Each oracle mirrors its Spark operator's *pinned* semantics 1:1 —
same md5-derived hashes, same shingling, same tie-breaks, same
rounding — built programmatically from the same constants so the two
definitions cannot drift silently.
"""

from __future__ import annotations

import hashlib

from eventhub_to_timescale_spark.operators.dedup import SIMHASH_BITS
from eventhub_to_timescale_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS,
    _PUNCT_RE,
    _TOKEN_RE,
)


def _h32(expr: str, seed: str = "") -> str:
    """DuckDB equivalent of functions.scalars.portable_hash32."""
    payload = f"'{seed}' || {expr}" if seed else expr
    return f"CAST(('0x' || substr(md5({payload}), 1, 8)) AS BIGINT)"


# word 3-gram shingles of a space-split text column (distinct), matching
# dedup.word_shingles (sequence(1, greatest(size-2,1)), slice(w,i,3))
_WORD_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(w) - 2, 1) + 1), "
    "i -> array_to_string(w[i:i+2], ' ')))"
)


def dedup_exact_oracle() -> str:
    return """
SELECT md5(text) AS text_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY 1 ORDER BY 1
"""


def dedup_minhash_oracle(
    num_hashes: int = 12, bands: int = 6, threshold: float = 0.5
) -> str:
    rows = num_hashes // bands
    sig_items = ", ".join(
        f"list_min(list_transform(shingles, x -> {_h32('x', f'mh{i}:')}))"
        for i in range(num_hashes)
    )
    # DuckDB lists are 1-indexed; Spark band b uses sig[b*rows + r] (0-idx)
    band_key = " || '_' || ".join(
        f"CAST(sig[b * {rows} + {r + 1}] AS VARCHAR)" for r in range(rows)
    )
    return f"""
WITH sh AS (
  SELECT doc_id, {_WORD_SHINGLES} AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
), sig AS (
  SELECT doc_id, shingles, [{sig_items}] AS sig FROM sh
), banded AS (
  SELECT doc_id, shingles, b, {band_key} AS band_key
  FROM sig, range({bands}) t(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
  FROM banded a JOIN banded b2
    ON a.b = b2.b AND a.band_key = b2.band_key AND a.doc_id < b2.doc_id
)
SELECT c.doc_a, c.doc_b,
       ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
             / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
         AS jaccard
FROM cand c
JOIN sh sa ON sa.doc_id = c.doc_a
JOIN sh sb ON sb.doc_id = c.doc_b
WHERE ROUND(len(list_intersect(sa.shingles, sb.shingles))::DOUBLE
            / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6)
      >= {threshold}
ORDER BY doc_a, doc_b
"""


def dedup_simhash_oracle(max_hamming: int = 3) -> str:
    h = _h32("x", "sh:")
    return f"""
WITH docs AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sums AS (
  SELECT doc_id, b,
         list_sum(list_transform(w, x ->
           CASE WHEN CAST(floor({h} / pow(2, b)) AS BIGINT) % 2 = 1
                THEN 1 ELSE -1 END)) AS s
  FROM docs, range({SIMHASH_BITS}) t(b)
), sh AS (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS sh
  FROM sums GROUP BY doc_id
), blocks AS (
  SELECT doc_id, sh, i,
         CAST(floor(sh / pow(2, 8 * i)) AS BIGINT) % 256 AS block_key
  FROM sh, range(4) t(i)
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
         a.sh AS sh_a, b2.sh AS sh_b
  FROM blocks a JOIN blocks b2
    ON a.i = b2.i AND a.block_key = b2.block_key AND a.doc_id < b2.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


def dedup_ngram_oracle(
    ngram: int = 5, threshold: float = 0.3, max_doc_id: int = 100
) -> str:
    return f"""
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(length(text) - {ngram - 1}, 1) + 1),
           i -> text[i:i+{ngram - 1}])) AS grams
  FROM documents WHERE doc_id < {max_doc_id}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE
             / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
FROM g a JOIN g b ON a.doc_id < b.doc_id
WHERE ROUND(len(list_intersect(a.grams, b.grams))::DOUBLE
            / len(list_distinct(list_concat(a.grams, b.grams))), 6) >= {threshold}
ORDER BY doc_a, doc_b
"""


_COSINE = (
    "list_dot_product(qv, cv) / "
    "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"
)


def sim_topk_oracle(query_max_id: int = 8, k: int = 5) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {query_max_id}),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id, e.v AS cv, qv
  FROM q, e WHERE e.vec_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, ROUND({_COSINE}, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ROUND({_COSINE}, 6) DESC, neighbor_id)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def _plane_literal(p: int, dim: int) -> str:
    comps = []
    for d in range(dim):
        h = int(hashlib.md5(f"p:{p}:{d}".encode()).hexdigest()[:8], 16)
        comps.append(repr(((h % 2001) - 1000) / 1000.0))
    return "[" + ", ".join(comps) + "]::DOUBLE[]"


def sim_ann_lsh_oracle(
    query_max_id: int = 8, k: int = 5, num_planes: int = 8, dim: int = 64
) -> str:
    sketch_terms = " + ".join(
        f"CASE WHEN list_dot_product(v, {_plane_literal(p, dim)}) > 0 "
        f"THEN {2 ** p} ELSE 0 END"
        for p in range(num_planes)
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         CAST({sketch_terms} AS BIGINT) AS sketch
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, sketch AS qsketch
      FROM e WHERE vec_id < {query_max_id}),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id, e.v AS cv, qv
  FROM q JOIN e ON e.sketch = qsketch AND e.vec_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, ROUND({_COSINE}, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ROUND({_COSINE}, 6) DESC, neighbor_id)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {k} ORDER BY query_id, rank
"""


def embedding_neardup_oracle(
    threshold: float = 0.3, num_planes: int = 8, dim: int = 64
) -> str:
    """Same hyperplane sketch (bucket) + exact cosine ≥ threshold."""
    sketch_terms = " + ".join(
        f"CASE WHEN list_dot_product(v, {_plane_literal(p, dim)}) > 0 "
        f"THEN {2 ** p} ELSE 0 END"
        for p in range(num_planes)
    )
    cos = (
        "list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         CAST({sketch_terms} AS BIGINT) AS sketch
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ROUND({cos}, 6) AS cosine
FROM e a JOIN e b ON a.sketch = b.sketch AND a.vec_id < b.vec_id
WHERE ROUND({cos}, 6) >= {threshold}
ORDER BY vec_a, vec_b
"""


def text_langid_oracle() -> str:
    hit_exprs = {
        lang: (
            "len(list_distinct(list_intersect("
            "string_split(lower(text), ' '), "
            "[" + ", ".join(f"'{m}'" for m in markers) + "])))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(hit_exprs.values()) + ")"
    whens = " ".join(
        f"WHEN {hit_exprs[lang]} > 0 AND {hit_exprs[lang]} = {best} THEN '{lang}'"
        for lang in sorted(hit_exprs)
    )
    return f"""
SELECT doc_id,
       CASE {whens} ELSE 'und' END AS lang_pred,
       CAST({best} AS INT) AS lang_hits
FROM documents
"""


def text_quality_oracle() -> str:
    stoplist = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
WITH base AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         len(string_split(text, ' ')) AS n_words,
         length(text) - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))
           AS n_punct,
         len(list_filter(string_split(lower(text), ' '),
                         x -> list_contains({stoplist}, x))) AS n_stop
  FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND((n_chars - (n_words - 1)) / n_words, 6) AS avg_word_len,
       ROUND(n_punct / n_chars, 6) AS punct_ratio,
       ROUND(n_stop / n_words, 6) AS stopword_ratio,
       ROUND(0.4 * least(n_words / 50.0, 1.0)
             + 0.3 * least(n_stop / n_words * 5, 1.0)
             + 0.3 * (1.0 - least(n_punct / n_chars * 10, 1.0)), 6) AS quality
FROM base
"""


def text_tokens_oracle() -> str:
    return f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{_TOKEN_RE}')) AS BIGINT)
         AS n_re_tokens,
       CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT)
         AS n_distinct_tokens
FROM documents
"""


def text_fingerprint_oracle(ngram: int = 8) -> str:
    return f"""
WITH n AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS norm
  FROM documents
)
SELECT doc_id,
       md5(norm) AS fp_md5,
       list_min(list_transform(
         range(1, greatest(length(norm) - {ngram - 1}, 1) + 1),
         i -> {_h32(f'norm[i:i+{ngram - 1}]')})) AS fp_min_gram
FROM n
"""


def clean_corpus_oracle(min_quality: float = 0.5) -> str:
    """Dedup (min doc_id per text) → lang-ID → quality filter, mirroring
    operators.text.clean_corpus."""
    hit_exprs = {
        lang: (
            "len(list_distinct(list_intersect("
            "string_split(lower(text), ' '), "
            "[" + ", ".join(f"'{m}'" for m in markers) + "])))"
        )
        for lang, markers in LANG_MARKERS.items()
    }
    best = "greatest(" + ", ".join(hit_exprs.values()) + ")"
    whens = " ".join(
        f"WHEN {hit_exprs[lang]} > 0 AND {hit_exprs[lang]} = {best} THEN '{lang}'"
        for lang in sorted(hit_exprs)
    )
    stoplist = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
WITH deduped AS (
  SELECT doc_id, text FROM documents
  QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
), scored AS (
  SELECT doc_id,
         CASE {whens} ELSE 'und' END AS lang_pred,
         ROUND(0.4 * least(len(string_split(text, ' ')) / 50.0, 1.0)
               + 0.3 * least(len(list_filter(string_split(lower(text), ' '),
                                 x -> list_contains({stoplist}, x)))
                             / len(string_split(text, ' ')) * 5, 1.0)
               + 0.3 * (1.0 - least((length(text)
                   - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g')))
                   / length(text) * 10, 1.0)), 6) AS quality
  FROM deduped
)
SELECT doc_id, lang_pred, quality FROM scored
WHERE quality >= {min_quality} ORDER BY doc_id
"""


def mm_blob_oracle() -> str:
    return """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents
"""
