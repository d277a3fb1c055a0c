"""DuckDB oracle-SQL twins for the non-trivial operators.

Each generator emits ANSI-ish SQL computing exactly what the Spark
operator computes — same md5-based hashing (functions/hashing.py), same
seeded parameters — so the driver's side-by-side hash comparison is
exact. These twins exist for correctness checking only; they are not
an execution path of the engine.
"""

from __future__ import annotations

import math

from dataset_grouper_spark.functions.hashing import (
    MERSENNE31,
    md5_long_sql,
    minhash_params,
    perm_hash_sql,
)

# NULL coalesced like hashing.tokens_sql (the repo-wide tokenizer
# contract): without it a NULL-text doc unnests to ZERO rows here
# while the Spark side tokenizes coalesce(NULL,'') to [''] — a
# row-count mismatch on any corpus with NULL text
STRIP = "regexp_replace(coalesce({col}, ''), '^\\s+|\\s+$', '', 'g')"


def shingle_cte(table: str, text_col: str, id_col: str, n: int) -> str:
    """CTE body producing DISTINCT (doc_id, shingle_h) hashed word
    n-grams — the 60-bit md5 hashing matches operators/dedup.shingles."""
    terms = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    stripped = STRIP.format(col=text_col)
    h = md5_long_sql(terms)
    return f"""
      toks AS (
        SELECT {id_col} AS _id, string_split({stripped}, ' ') AS t
        FROM {table}
      ),
      sh AS (
        SELECT DISTINCT _id, {h} AS shingle_h
        FROM toks, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0)))
             AS g(i)
      )"""


def ngram_jaccard_sql(
    table: str, text_col: str, id_col: str, n: int, threshold: float
) -> str:
    return f"""
      WITH {shingle_cte(table, text_col, id_col, n)},
      sz AS (SELECT _id, count(*) AS s FROM sh GROUP BY _id),
      inter AS (
        SELECT a._id AS id_a, b._id AS id_b, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle_h = b.shingle_h AND a._id < b._id
        GROUP BY 1, 2
      )
      SELECT id_a, id_b,
             round(i * 1.0 / (x.s + y.s - i), 6) AS jaccard
      FROM inter
      JOIN sz x ON id_a = x._id
      JOIN sz y ON id_b = y._id
      WHERE round(i * 1.0 / (x.s + y.s - i), 6) >= {threshold}
    """


def minhash_sig_cte(
    table: str, text_col: str, id_col: str, n: int, num_perm: int, seed: int
) -> str:
    params = minhash_params(num_perm, seed)
    mins = ",\n               ".join(
        f"coalesce(min({perm_hash_sql('shingle_h', a, b)}), {MERSENNE31}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )
    return f"""
      {shingle_cte(table, text_col, id_col, n)},
      sig AS (
        SELECT _id, {mins}
        FROM sh GROUP BY _id
      )"""


def lsh_pairs_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int,
    num_perm: int,
    bands: int,
    seed: int,
) -> str:
    r = num_perm // bands
    unions = []
    for b in range(bands):
        conds = " AND ".join(
            f"x.m{b * r + j} = y.m{b * r + j}" for j in range(r)
        )
        unions.append(
            f"SELECT x._id AS id_a, y._id AS id_b FROM sig x "
            f"JOIN sig y ON {conds} AND x._id < y._id"
        )
    u = "\n        UNION\n        ".join(unions)
    return f"""
      WITH {minhash_sig_cte(table, text_col, id_col, n, num_perm, seed)}
      SELECT DISTINCT id_a, id_b FROM (
        {u}
      )
    """


def simhash_sql(table: str, text_col: str, id_col: str, bits: int) -> str:
    stripped = STRIP.format(col=text_col)
    h = md5_long_sql("tok")
    votes = ",\n               ".join(
        f"sum(((hv >> {i}) & 1) * 2 - 1) AS s{i}" for i in range(bits)
    )
    recon = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(bits)
    )
    return f"""
      WITH toks AS (
        SELECT {id_col} AS _id,
               unnest(string_split({stripped}, ' ')) AS tok
        FROM {table}
      ),
      hs_t AS (SELECT _id, {h} AS hv FROM toks),
      v AS (SELECT _id, {votes} FROM hs_t GROUP BY _id)
      SELECT _id AS {id_col}, CAST({recon} AS BIGINT) AS simhash FROM v
    """


def cosine_topk_sql(
    table: str,
    vec_col: str,
    id_col: str,
    query_filter: str,
    k: int,
    round_digits: int = 6,
) -> str:
    return f"""
      WITH c AS (
        SELECT {id_col} AS nid,
               list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS cv
        FROM {table}
      ),
      q AS (
        SELECT {id_col} AS qid,
               list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS qv
        FROM {table} WHERE {query_filter}
      ),
      s AS (
        SELECT qid AS query_id, nid AS neighbor_id,
               round_even(list_dot_product(qv, cv) /
                     (sqrt(list_dot_product(qv, qv)) *
                      sqrt(list_dot_product(cv, cv))), {round_digits}) AS cosine
        FROM q, c WHERE nid != qid
      ),
      ranked AS (
        SELECT query_id, neighbor_id, cosine,
               CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        FROM s
      )
      SELECT * FROM ranked WHERE rank <= {k}
    """


def _dbl(vec_expr: str) -> str:
    return f"list_transform({vec_expr}, x -> CAST(x AS DOUBLE))"


def _cos(a: str, b: str, round_digits: int = 6) -> str:
    return (
        f"round_even(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * "
        f"sqrt(list_dot_product({b}, {b}))), {round_digits})"
    )


def lsh_signature_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """b-bit sign signature — twin of similarity.signature_expr. The
    plane constants are the exact same Python floats the Spark side
    embeds as literals (repr round-trips float64 exactly)."""
    terms = []
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {arr}) > 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def lsh_topk_sql(
    table: str,
    vec_col: str,
    id_col: str,
    query_filter: str,
    dim: int,
    k: int,
    bits: int,
    tables: int,
    seed: int,
    round_digits: int = 6,
) -> str:
    """Twin of similarity.lsh_topk: table-tagged bucket equijoin for
    candidates, exact cosine rerank, row_number top-k."""
    from dataset_grouper_spark.operators.similarity import hyperplanes

    def buckets(vec_var: str) -> str:
        return ", ".join(
            f"('{t}_' || CAST("
            + lsh_signature_sql(vec_var, hyperplanes(dim, bits, seed + t))
            + " AS VARCHAR))"
            for t in range(tables)
        )

    return f"""
      WITH c AS (
        SELECT {id_col} AS neighbor_id, {_dbl(vec_col)} AS cv FROM {table}
      ),
      q AS (
        SELECT {id_col} AS query_id, {_dbl(vec_col)} AS qv
        FROM {table} WHERE {query_filter}
      ),
      cb AS (SELECT neighbor_id, unnest([{buckets('cv')}]) AS bucket FROM c),
      qb AS (SELECT query_id, unnest([{buckets('qv')}]) AS bucket FROM q),
      cand AS (
        SELECT DISTINCT query_id, neighbor_id
        FROM cb JOIN qb USING (bucket)
        WHERE neighbor_id != query_id
      ),
      s AS (
        SELECT cand.query_id, cand.neighbor_id,
               {_cos('c.cv', 'q.qv', round_digits)} AS cosine
        FROM cand
        JOIN c ON cand.neighbor_id = c.neighbor_id
        JOIN q ON cand.query_id = q.query_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id, cosine,
               CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        FROM s
      )
      SELECT * FROM ranked WHERE rank <= {k}
    """


def ivf_topk_flat_sql(
    table: str,
    vec_col: str,
    id_col: str,
    query_filter: str,
    k: int,
    num_centroids: int,
    nprobe: int,
    round_digits: int = 6,
) -> str:
    """Twin of similarity.ivf_topk_flat: hash-sampled centroids,
    argmin-L2 cell assignment (ties to smaller centroid id), nprobe
    cells per query, exact cosine rerank."""
    h = md5_long_sql(f"CAST({id_col} AS VARCHAR)")
    return f"""
      WITH cents AS (
        SELECT {id_col} AS cent_id, {_dbl(vec_col)} AS cent_v
        FROM {table}
        ORDER BY {h}, {id_col}
        LIMIT {num_centroids}
      ),
      c AS (SELECT {id_col} AS _cid, {_dbl(vec_col)} AS cv FROM {table}),
      assigned AS (
        SELECT _cid, cv, cluster FROM (
          SELECT c._cid, c.cv, ct.cent_id AS cluster,
                 row_number() OVER (PARTITION BY c._cid
                   ORDER BY list_distance(c.cv, ct.cent_v), ct.cent_id) AS r
          FROM c CROSS JOIN cents ct
        ) WHERE r = 1
      ),
      q AS (
        SELECT {id_col} AS query_id, {_dbl(vec_col)} AS qv
        FROM {table} WHERE {query_filter}
      ),
      probes AS (
        SELECT query_id, qv, cluster FROM (
          SELECT q.query_id, q.qv, ct.cent_id AS cluster,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_distance(q.qv, ct.cent_v), ct.cent_id) AS r
          FROM q CROSS JOIN cents ct
        ) WHERE r <= {nprobe}
      ),
      s AS (
        SELECT p.query_id, a._cid AS neighbor_id,
               {_cos('a.cv', 'p.qv', round_digits)} AS cosine
        FROM assigned a JOIN probes p USING (cluster)
        WHERE a._cid != p.query_id
      ),
      ranked AS (
        SELECT query_id, neighbor_id, cosine,
               CAST(row_number() OVER (
                 PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        FROM s
      )
      SELECT * FROM ranked WHERE rank <= {k}
    """


def _cells_ctes(
    n_body: str,
    count_from: str,
    num_cells: int | str,
    probe: int,
    target_cell_rows: int,
    two_level: bool = False,
    coarse_probe: int = 2,
) -> str:
    """Shared cell-construction CTE chain (``n`` -> ``cents`` ->
    ``asg`` -> ``cand``) for the cosine_pairs_cells twins. ``n_body``
    must yield ``(_id, v double list)``; ``count_from`` is the
    relation whose row count drives the "auto" cell count (must match
    the Spark side's ``df.count()``).

    ``two_level=True`` mirrors the Spark side's two-level coarse
    quantizer (similarity.cosine_pairs_cells past
    ``two_level_threshold``): the first ceil(sqrt(C)) centroids in
    the SAME (md5, id) order become coarse cells; each fine centroid
    is assigned to its nearest coarse cell (ties to the smaller coarse
    id); each vector takes its ``probe`` nearest FINE cells among the
    fine centroids of its ``coarse_probe`` nearest coarse cells. The
    caller must only use this when the Spark side's derived cell
    count exceeds its threshold at EVERY scale the query runs at —
    the SQL chain is static while the Spark tier switch is a runtime
    comparison."""
    h = md5_long_sql("CAST(_id AS VARCHAR)")
    if num_cells == "auto":
        limit = (
            "(SELECT GREATEST(1, CAST(ceil(count(*) / "
            f"CAST({target_cell_rows} AS DOUBLE)) AS BIGINT)) "
            f"FROM {count_from})"
        )
        probe_expr = f"LEAST({probe}, (SELECT count(*) FROM cents))"
        # coarse count = ceil(sqrt(C)) with C the DERIVED cell count
        # (not count(cents)): mirrors the Spark side, which sizes the
        # coarse level from num_cells before ever materializing cents
        coarse_limit = (
            "(SELECT GREATEST(1, CAST(ceil(sqrt(ceil(count(*) / "
            f"CAST({target_cell_rows} AS DOUBLE)))) AS BIGINT)) "
            f"FROM {count_from})"
        )
    else:
        limit = str(int(num_cells))
        probe_expr = str(int(probe))
        coarse_limit = str(
            max(1, math.ceil(math.sqrt(int(num_cells))))
        )
    cents = f"""
      n AS ({n_body}),
      cents AS (
        SELECT _id AS cent_id, v AS cent_v FROM n
        ORDER BY {h}, _id LIMIT {limit}
      )"""
    if not two_level:
        return f"""{cents},
      asg AS (
        SELECT _id, cell FROM (
          SELECT n._id, ct.cent_id AS cell,
                 row_number() OVER (PARTITION BY n._id
                   ORDER BY list_distance(n.v, ct.cent_v), ct.cent_id) AS r
          FROM n CROSS JOIN cents ct
        ) WHERE r <= {probe_expr}
      ),
      cand AS (
        SELECT DISTINCT x._id AS id_a, y._id AS id_b
        FROM asg x JOIN asg y ON x.cell = y.cell AND x._id < y._id
      )"""
    hc = md5_long_sql("CAST(cent_id AS VARCHAR)")
    coarse_probe_expr = (
        f"LEAST({int(coarse_probe)}, (SELECT count(*) FROM coarse))"
    )
    return f"""{cents},
      coarse AS (
        SELECT cent_id AS co_id, cent_v AS co_v FROM (
          SELECT cent_id, cent_v,
                 row_number() OVER (ORDER BY {hc}, cent_id) AS r
          FROM cents
        ) WHERE r <= {coarse_limit}
      ),
      f2c AS (
        SELECT cent_id, cent_v, co_id FROM (
          SELECT c.cent_id, c.cent_v, co.co_id,
                 row_number() OVER (PARTITION BY c.cent_id
                   ORDER BY list_distance(c.cent_v, co.co_v), co.co_id) AS r
          FROM cents c CROSS JOIN coarse co
        ) WHERE r = 1
      ),
      vpro AS (
        SELECT _id, co_id FROM (
          SELECT n._id, co.co_id,
                 row_number() OVER (PARTITION BY n._id
                   ORDER BY list_distance(n.v, co.co_v), co.co_id) AS r
          FROM n CROSS JOIN coarse co
        ) WHERE r <= {coarse_probe_expr}
      ),
      asg AS (
        SELECT _id, cell FROM (
          SELECT p._id, f.cent_id AS cell,
                 row_number() OVER (PARTITION BY p._id
                   ORDER BY list_distance(nn.v, f.cent_v), f.cent_id) AS r
          FROM vpro p
          JOIN f2c f ON f.co_id = p.co_id
          JOIN n nn ON nn._id = p._id
        ) WHERE r <= {probe_expr}
      ),
      cand AS (
        SELECT DISTINCT x._id AS id_a, y._id AS id_b
        FROM asg x JOIN asg y ON x.cell = y.cell AND x._id < y._id
      )"""


def cosine_pairs_cells_sql(
    n_body: str,
    count_from: str,
    threshold: float,
    num_cells: int | str,
    probe: int,
    round_digits: int = 6,
    target_cell_rows: int = 4096,
    two_level: bool = False,
    coarse_probe: int = 2,
) -> str:
    """Twin of similarity.cosine_pairs_cells over an arbitrary
    ``(_id, v)`` vector CTE body: emits ``(id_a, id_b, cosine)`` for
    every cell-sharing pair above threshold. ``two_level`` mirrors
    the two-level coarse quantizer (see ``_cells_ctes``)."""
    cells = _cells_ctes(
        n_body, count_from, num_cells, probe, target_cell_rows,
        two_level=two_level, coarse_probe=coarse_probe,
    )
    return f"""
      WITH {cells}
      SELECT c.id_a, c.id_b,
             {_cos('a.v', 'b.v', round_digits)} AS cosine
      FROM cand c
      JOIN n a ON a._id = c.id_a
      JOIN n b ON b._id = c.id_b
      WHERE {_cos('a.v', 'b.v', round_digits)} >= {threshold}
    """


def semdedup_cells_sql(
    table: str,
    vec_col: str,
    id_col: str,
    threshold: float,
    num_cells: int | str,
    probe: int,
    round_digits: int = 6,
    target_cell_rows: int = 4096,
    two_level: bool = False,
    coarse_probe: int = 2,
) -> str:
    """Twin of similarity.embedding_neardup_clusters(num_cells=...):
    hash-sampled flat centroids (same scheme as ivf_topk_flat_sql),
    each vector's `probe` nearest cells, candidate pairs = pairs
    sharing a cell, exact cosine edge filter, recursive-CTE connected
    components, singletons labeling themselves. ``num_cells="auto"``
    mirrors the Spark side's count-derived cell count (ceil(n /
    target_cell_rows), probe clamped to it). ``two_level`` mirrors
    the two-level coarse quantizer (see ``_cells_ctes``)."""
    cells = _cells_ctes(
        f"SELECT {id_col} AS _id, {_dbl(vec_col)} AS v FROM {table}",
        table,
        num_cells,
        probe,
        target_cell_rows,
        two_level=two_level,
        coarse_probe=coarse_probe,
    )
    return f"""
      WITH RECURSIVE {cells},
      e0 AS (
        SELECT c.id_a, c.id_b
        FROM cand c
        JOIN n a ON a._id = c.id_a
        JOIN n b ON b._id = c.id_b
        WHERE {_cos('a.v', 'b.v', round_digits)} >= {threshold}
      ),
      e AS (
        SELECT id_a AS a, id_b AS b FROM e0
        UNION SELECT id_b, id_a FROM e0
      ),
      reach(id, lbl) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id
      ),
      comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
      SELECT v.{id_col}, COALESCE(c.component, v.{id_col}) AS cluster_id
      FROM {table} v LEFT JOIN comp c ON v.{id_col} = c.id
    """


def exact_dedup_sql(table: str, content_col: str, id_col: str, keep_cols: str) -> str:
    return f"""
      WITH ranked AS (
        SELECT {keep_cols},
               row_number() OVER (PARTITION BY md5({content_col})
                                  ORDER BY {id_col}) AS _rn,
               CAST(count(*) OVER (PARTITION BY md5({content_col})) AS BIGINT)
                 AS dup_count
        FROM {table}
      )
      SELECT {keep_cols}, dup_count FROM ranked WHERE _rn = 1
    """


def image_meta_sql(table: str, text_col: str, id_col: str) -> str:
    """Twin of the deterministic fake image decoder
    (operators/multimodal.py:_fake_decode): metadata derived from the
    sha256 of the payload bytes."""
    sha = f"sha256({text_col})"  # DuckDB hashes the VARCHAR's utf-8 bytes
    b0 = f"(('0x' || substr({sha}, 1, 2))::INT)"
    b1 = f"(('0x' || substr({sha}, 3, 2))::INT)"
    b2 = f"(('0x' || substr({sha}, 5, 2))::INT)"
    return f"""
      SELECT {id_col} AS id,
             CAST(strlen({text_col}) AS BIGINT) AS n_bytes,
             CASE {b0} % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                  ELSE 'webp' END AS format,
             CAST(16 + {b1} % 241 AS INT) AS width,
             CAST(16 + {b2} % 241 AS INT) AS height,
             {sha} AS sha
      FROM {table}
    """


def neardup_clusters_sql(
    table: str,
    text_col: str,
    id_col: str,
    n: int,
    num_perm: int,
    bands: int,
    seed: int,
) -> str:
    """Twin of dedup.cluster_near_dups: same banded-LSH candidate
    edges, then connected components as a recursive CTE — labels
    propagate along (symmetric) edges and each node takes the MIN
    reachable id, exactly the fixpoint min-label propagation computes.
    """
    r = num_perm // bands
    unions = []
    for b in range(bands):
        conds = " AND ".join(
            f"x.m{b * r + j} = y.m{b * r + j}" for j in range(r)
        )
        unions.append(
            f"SELECT x._id AS id_a, y._id AS id_b FROM sig x "
            f"JOIN sig y ON {conds} AND x._id < y._id"
        )
    u = "\n        UNION\n        ".join(unions)
    return f"""
      WITH RECURSIVE {minhash_sig_cte(table, text_col, id_col, n, num_perm, seed)},
      cand AS (
        SELECT DISTINCT id_a, id_b FROM (
          {u}
        )
      ),
      e AS (
        SELECT id_a AS a, id_b AS b FROM cand
        UNION SELECT id_b, id_a FROM cand
      ),
      reach(id, lbl) AS (
        SELECT a, a FROM e
        UNION
        SELECT e.b, r.lbl FROM reach r JOIN e ON e.a = r.id
      ),
      comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
      SELECT d.{id_col},
             COALESCE(c.component, d.{id_col}) AS cluster_id
      FROM {table} d LEFT JOIN comp c ON d.{id_col} = c.id
    """


def contamination_sql(
    table: str,
    text_col: str,
    id_col: str,
    bench_filter: str,
    n: int,
) -> str:
    """Twin of dedup.contamination with the benchmark side defined as
    ``table WHERE bench_filter`` (the driver harness has one corpus, so
    the eval set is carved from it by filter)."""
    terms = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    stripped = STRIP.format(col=text_col)
    h = md5_long_sql(terms)
    return f"""
      WITH toks AS (
        SELECT {id_col} AS _id, string_split({stripped}, ' ') AS t
        FROM {table}
      ),
      sh AS (
        SELECT DISTINCT _id, {h} AS shingle_h
        FROM toks, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0)))
             AS g(i)
      ),
      btoks AS (
        SELECT {id_col} AS _bid, string_split({stripped}, ' ') AS t
        FROM {table} WHERE {bench_filter}
      ),
      bsh AS (
        SELECT DISTINCT _bid, {h} AS shingle_h
        FROM btoks, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0)))
             AS g(i)
      ),
      tot AS (SELECT _id, count(*) AS total_ngrams FROM sh GROUP BY _id),
      hit AS (
        SELECT s._id,
               count(DISTINCT s.shingle_h) AS contaminated_ngrams,
               count(DISTINCT b._bid) AS bench_docs_hit
        FROM sh s JOIN bsh b USING (shingle_h)
        GROUP BY s._id
      )
      SELECT d.{id_col},
             CAST(COALESCE(t.total_ngrams, 0) AS BIGINT) AS total_ngrams,
             CAST(COALESCE(h.contaminated_ngrams, 0) AS BIGINT)
               AS contaminated_ngrams,
             CAST(COALESCE(h.bench_docs_hit, 0) AS BIGINT) AS bench_docs_hit
      FROM {table} d
      LEFT JOIN tot t ON d.{id_col} = t._id
      LEFT JOIN hit h ON d.{id_col} = h._id
    """


def pii_redact_sql(table: str, text_col: str, id_col: str) -> str:
    """Twin of functions/redact.redact_table over synthesized PII
    (same concat as the Spark query). Patterns live in redact.py and
    are written in the Java-regex/RE2 common subset, so 'g'-flagged
    DuckDB regexp_replace is byte-identical."""
    from dataset_grouper_spark.functions.redact import (
        EMAIL_RE,
        EMAIL_TOKEN,
        IPV4_RE,
        IPV4_TOKEN,
        PHONE_RE,
        PHONE_TOKEN,
    )

    synth = (
        f"{text_col} || ' contact user' || CAST({id_col} AS VARCHAR)"
        f" || '@' || source || '.example.com from 10.'"
        f" || CAST({id_col} % 200 AS VARCHAR) || '.0.'"
        f" || CAST({id_col} % 250 AS VARCHAR)"
        f" || ' call +1 555-01' || lpad(CAST({id_col} % 100 AS VARCHAR), 2, '0')"
    )
    return f"""
      WITH base AS (SELECT {id_col}, {synth} AS t FROM {table}),
      s1 AS (
        SELECT {id_col}, t,
               regexp_replace(t, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g') AS t1
        FROM base
      ),
      s2 AS (
        SELECT {id_col}, t, t1,
               regexp_replace(t1, '{IPV4_RE}', '{IPV4_TOKEN}', 'g') AS t2
        FROM s1
      )
      SELECT {id_col},
             CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
             CAST(len(regexp_extract_all(t1, '{IPV4_RE}')) AS BIGINT) AS n_ips,
             CAST(len(regexp_extract_all(t2, '{PHONE_RE}')) AS BIGINT)
               AS n_phones,
             regexp_replace(t2, '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS redacted
      FROM s2
    """


def url_canonicalize_sql(table: str, id_col: str) -> str:
    """Twin of the url_canonicalize_documents query: same messy-URL
    synthesis, canonicalized by functions/urls.canonical_url_sql."""
    from dataset_grouper_spark.functions.urls import canonical_url_sql

    synth = (
        f"'HTTPS://WWW.' || source || '.Example.COM/Path/'"
        f" || CAST({id_col} AS VARCHAR) || '/?utm_source=feed&id='"
        f" || CAST({id_col} % 7 AS VARCHAR) || '&utm_campaign=c&gclid=x#frag'"
    )
    return f"""
      SELECT {id_col}, {canonical_url_sql(synth)} AS canonical_url
      FROM {table}
    """


def minhash_against_sql(
    table: str,
    text_col: str,
    id_col: str,
    new_filter: str,
    n: int,
    num_perm: int,
    bands: int,
    seed: int,
    keep_cols: str,
) -> str:
    """Twin of dedup.minhash_dedup_against with the new batch carved
    from ``table`` by ``new_filter`` (existing corpus = the rest):
    surviving new rows share no LSH band with any existing doc."""
    params = minhash_params(num_perm, seed)
    r = num_perm // bands
    terms = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    h = md5_long_sql(terms)
    mins = ",\n               ".join(
        f"coalesce(min({perm_hash_sql('shingle_h', a, b)}), {MERSENNE31}) AS m{i}"
        for i, (a, b) in enumerate(params)
    )

    def side(sfx: str, where: str) -> str:
        stripped = STRIP.format(col=text_col)
        return f"""
      toks{sfx} AS (
        SELECT {id_col} AS _id, string_split({stripped}, ' ') AS t
        FROM {table} WHERE {where}
      ),
      sh{sfx} AS (
        SELECT DISTINCT _id, {h} AS shingle_h
        FROM toks{sfx}, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0)))
             AS g(i)
      ),
      sig{sfx} AS (SELECT _id, {mins} FROM sh{sfx} GROUP BY _id)"""

    band_hits = "\n        UNION\n        ".join(
        "SELECT nw._id FROM signew nw JOIN sigold od ON "
        + " AND ".join(f"nw.m{b * r + j} = od.m{b * r + j}" for j in range(r))
        for b in range(bands)
    )
    return f"""
      WITH {side('new', new_filter)},
      {side('old', f'NOT ({new_filter})')},
      hits AS (
        SELECT DISTINCT _id FROM (
        {band_hits}
        )
      )
      SELECT {keep_cols} FROM {table}
      WHERE ({new_filter})
        AND {id_col} NOT IN (SELECT _id FROM hits)
    """


def pipeline_ingest_sql(
    table: str,
    text_col: str,
    id_col: str,
    bench_filter: str,
    contam_n: int,
    dup_n: int,
    dup_frac_max: float,
    cap: int,
) -> str:
    """Twin of the pipeline_ingest_style composition: decontaminate
    (any contam_n-gram overlap with the bench slice drops the doc) ->
    dup_n-gram duplicated-span filter -> md5-order per-source cap ->
    per-source counts."""

    def sh_cte(sfx: str, n: int, where: str = "TRUE") -> str:
        terms = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
        stripped = STRIP.format(col=text_col)
        return f"""
      toks{sfx} AS (
        SELECT {id_col} AS _id, string_split({stripped}, ' ') AS t
        FROM {table} WHERE {where}
      ),
      sh{sfx} AS (
        SELECT DISTINCT _id, {md5_long_sql(terms)} AS shingle_h
        FROM toks{sfx}, unnest(generate_series(1, greatest(len(t) - {n - 1}, 0)))
             AS g(i)
      )"""

    return f"""
      WITH {sh_cte('c', contam_n)},
      {sh_cte('b', contam_n, bench_filter)},
      contam AS (
        SELECT DISTINCT s._id FROM shc s
        JOIN shb b USING (shingle_h)
      ),
      {sh_cte('d', dup_n)},
      freq AS (SELECT shingle_h, count(*) AS _df FROM shd GROUP BY shingle_h),
      dupstats AS (
        SELECT _id, count(*) AS total,
               sum(CASE WHEN _df > 1 THEN 1 ELSE 0 END) AS dup
        FROM shd JOIN freq USING (shingle_h) GROUP BY _id
      ),
      kept AS (
        -- INNER join, stated plainly: the previous LEFT JOIN was
        -- nullified by the non-null-safe dup-fraction predicate
        -- (docs with no shingles -> NULL < NULL -> dropped), which
        -- happens to match the Spark side's coalesced 0 < 0 = false —
        -- an inner join says what actually executes
        SELECT d.{id_col}, d.source FROM {table} d
        JOIN dupstats ds ON d.{id_col} = ds._id
        WHERE d.{id_col} NOT IN (SELECT _id FROM contam)
          AND ds.dup < {dup_frac_max} * ds.total
      ),
      capped AS (
        SELECT {id_col}, source FROM kept
        QUALIFY row_number() OVER (
          PARTITION BY source
          ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}
        ) <= {cap}
      )
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             min({id_col}) AS min_doc_id,
             CAST(0 AS BIGINT) AS n_oversized_buckets,
             CAST(0 AS BIGINT) AS n_dropped_members
      FROM capped GROUP BY source
    """


# --- IMA-ADPCM: independent scalar spec expansion (NOT the numpy
# production decoder in operators/audio.py — agreement between the two
# is the point of the oracle).
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]
_IMA_IDX = [-1, -1, -1, -1, 2, 4, 6, 8] * 2


def ima_adpcm_offsets(nibbles: list[int]) -> list[int]:
    """Spec expansion of a nibble sequence from (pred=0, index=0),
    UNCLAMPED — valid as a predictor-relative offset table only while
    the true samples stay far from the int16 rails (the fixture
    guarantees it). Offset 0 is the block-header predictor itself."""
    pred, index, out = 0, 0, [0]
    for n in nibbles:
        step = _IMA_STEPS[index]
        diff = step >> 3
        if n & 1:
            diff += step >> 2
        if n & 2:
            diff += step >> 1
        if n & 4:
            diff += step
        if n & 8:
            diff = -diff
        pred += diff
        index = max(0, min(88, index + _IMA_IDX[n]))
        out.append(pred)
    return out


def adpcm_features_sql(
    table: str, id_col: str, nibbles: list[int], rate: int
) -> str:
    """Closed-form twin of audio_features over the ADPCM fixture: doc
    ``d`` holds ``2 + d%3`` blocks anchored at ``500 + (d*37 +
    b*101) % 1500``; every decoded sample is anchor + offset, all
    positive, so peak/energy/crossings reduce to the offset moments."""
    c = ima_adpcm_offsets(nibbles)
    if min(c) <= -500 or max(c) + 1999 > 32767:
        raise ValueError("fixture offsets violate the all-positive bound")
    spb, ssum, ssq, cmax = len(c), sum(c), sum(v * v for v in c), max(c)
    return f"""
        WITH blocks AS (
            SELECT {id_col} AS id,
                   2 + {id_col} % 3 AS n_blocks,
                   500 + ({id_col}*37 + b.b*101) % 1500 AS p
            FROM {table},
                 LATERAL (SELECT UNNEST(range(2 + {id_col} % 3)) AS b) b
        )
        SELECT id,
               CAST({spb} * n_blocks AS BIGINT) AS n_frames,
               CAST(({spb} * n_blocks * 1000) // {rate} AS BIGINT)
                   AS duration_ms,
               CAST(max(p) + {cmax} AS BIGINT) AS peak,
               CAST(sum({spb}*p*p + 2*p*({ssum}) + {ssq}) AS BIGINT)
                   AS sum_sq,
               CAST(0 AS BIGINT) AS zero_crossings
        FROM blocks
        GROUP BY id, n_blocks
    """
