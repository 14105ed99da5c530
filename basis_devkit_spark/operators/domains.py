"""Per-domain curation operators (RefinedWeb-style).

Real crawl pipelines cap and dedup BY REGISTRABLE DOMAIN before anything
else (Penedo et al., "The RefinedWeb Dataset for Falcon LLM", 2023 —
URL-level filtering and per-domain caps precede content dedup): a single
mega-host (a link farm, a mirror, one SEO domain) must not dominate the
corpus mix. The registrable domain ("example.co.uk" for
"a.b.example.co.uk") is the eTLD+1 under the Public Suffix List's
algorithm: find the longest known public suffix, keep one label left of
it; unknown TLDs fall back to the PSL default rule (the last label is
the suffix).

Scale shape: suffix matching is a LITERAL MAP lookup (only MULTI-label
suffixes need an entry — the default rule already handles every
single-label TLD), so :func:`registrable_domain` is a pure column
projection: zero joins, zero shuffles, fuses into the scan. Production
deployments load the full Public Suffix List (~9k rules; public domain
data) into the ``suffixes=`` parameter; the built-in
:data:`MULTI_LABEL_SUFFIXES` is a curated common subset with the same
semantics. :func:`domain_cap` then rides the BOUNDED grouped reservoir
(``weighted_reservoir_sample_grouped`` — merge buffers capped at
``merge_fanin × k`` structs), so one mega-domain spanning every map
partition of a 100 TB crawl never funnels through a single reducer or
builds an unbounded merge buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MULTI_LABEL_SUFFIXES",
    "WILDCARD_RULES",
    "PSL_RULES",
    "TRACKING_PARAM_RE",
    "parse_psl",
    "registrable_domain",
    "canonical_url",
    "domain_cap",
    "url_features",
]

#: Curated multi-label public suffixes (PSL subset, literal rules
#: only). Single-label TLDs (com, org, io, …) are intentionally
#: ABSENT: the PSL default rule — last label is the suffix — covers
#: them without a table entry, so the literal map stays small.
#: Includes private-section suffixes (github.io, blogspot.com, …)
#: because curation wants user sites on shared hosts treated as
#: distinct domains, exactly like the PSL.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    # ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "ltd.uk", "plc.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz", "iwi.nz", "mil.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "adv.br", "blog.br",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    "busan.kr",
    "co.th", "ac.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "k12.il", "idf.il",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar",
    "int.ar", "mil.ar", "tur.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr",
    "bel.tr", "pol.tr", "av.tr", "dr.tr", "k12.tr", "gen.tr", "web.tr",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "game.tw", "club.tw", "ebiz.tw", "mil.tw",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "biz.pl",
    "com.ru", "net.ru", "org.ru", "pp.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "kyiv.ua",
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "mil.id", "my.id", "biz.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "name.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "eun.eg", "mil.eg", "name.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "pub.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "i.ng",
    "sch.ng", "name.ng", "mobi.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt",
    "publ.pt", "nome.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "gov.it", "edu.it",
    "gouv.fr", "asso.fr", "nom.fr", "com.fr", "tm.fr",
    "ac.at", "co.at", "gv.at", "or.at",
    "ac.be",
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co",
    "nom.co",
    "gob.cl", "gov.cl", "mil.cl",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe",
    "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve",
    "co.ve", "info.ve", "web.ve",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gov.ec", "gob.ec",
    "mil.ec", "info.ec", "fin.ec", "med.ec", "pro.ec", "k12.ec",
    "com.uy", "edu.uy", "gub.uy", "net.uy", "mil.uy", "org.uy",
    "com.pk", "net.pk", "edu.pk", "org.pk", "fam.pk", "biz.pk",
    "web.pk", "gov.pk",
    "com.lk", "org.lk", "edu.lk", "ngo.lk", "soc.lk", "web.lk",
    "ltd.lk", "assn.lk", "grp.lk", "hotel.lk", "gov.lk", "sch.lk",
    "net.lk", "int.lk",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    # private-section shared hosts
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "appspot.com", "herokuapp.com", "firebaseapp.com", "netlify.app",
    "vercel.app", "web.app", "pages.dev", "workers.dev",
    "cloudfront.net", "s3.amazonaws.com", "azurewebsites.net",
    "wordpress.com", "readthedocs.io", "neocities.org", "surge.sh",
)

#: Wildcard and exception rules (PSL syntax). ``*.ck`` — every 2-label
#: name directly under ``ck`` is a public suffix; ``!www.ck`` — except
#: ``www.ck``, which is itself a registrable domain. These are the
#: long-standing ccTLD wildcards from the public-domain PSL snapshot.
WILDCARD_RULES: tuple[str, ...] = (
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.jm", "*.kh",
    "*.mm", "*.np", "*.pg",
)

#: The full built-in rule set: literal multi-label suffixes plus
#: wildcard/exception rules. Pass the real PSL snapshot (via
#: :func:`parse_psl`) to ``registrable_domain(suffixes=...)`` to
#: replace it wholesale in production.
PSL_RULES: tuple[str, ...] = MULTI_LABEL_SUFFIXES + WILDCARD_RULES


def parse_psl(text: str, include_private: bool = True) -> list[str]:
    """Parse the raw Public Suffix List file
    (https://publicsuffix.org/list/public_suffix_list.dat, public
    domain) into the rule list :func:`registrable_domain` accepts:
    strips ``//`` comments and blank lines, keeps wildcard (``*.``)
    and exception (``!``) markers verbatim, lowercases, and optionally
    drops the PRIVATE DOMAINS section (ICANN-only matching).
    IDN rules pass through in their Unicode form — feed hosts in the
    same form (or pre-convert both sides to punycode)."""
    rules: list[str] = []
    private = False
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            if "===BEGIN PRIVATE DOMAINS===" in line:
                private = True
            elif "===END PRIVATE DOMAINS===" in line:
                private = False
            continue
        if private and not include_private:
            continue
        rules.append(line.split()[0].lower())
    return rules


#: Path of the bundled full-PSL snapshot (standard
#: public_suffix_list.dat layout, ~9.8k rules — see the file header
#: for provenance). The curated :data:`PSL_RULES` literal set remains
#: the no-data-file fallback.
import os as _os

PSL_SNAPSHOT_PATH = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    "data",
    "public_suffix_list.dat",
)

_PSL_SNAPSHOT_CACHE: dict[bool, list[str]] = {}


def load_psl_snapshot(include_private: bool = True) -> list[str]:
    """The bundled full Public Suffix List snapshot as a rule list
    (parsed once per process per section choice; ~9.8k rules). Falls
    back to the curated :data:`PSL_RULES` literal set when the package
    data file is absent (e.g. a source checkout stripped of data
    files) — the fallback covers the high-traffic registry suffixes
    but NOT the long tail (deep ccTLD registries, most private-section
    hosts), so bundle the data file in production builds."""
    if include_private not in _PSL_SNAPSHOT_CACHE:
        if _os.path.exists(PSL_SNAPSHOT_PATH):
            with open(PSL_SNAPSHOT_PATH, encoding="utf-8") as f:
                _PSL_SNAPSHOT_CACHE[include_private] = parse_psl(
                    f.read(), include_private=include_private
                )
        else:
            _PSL_SNAPSHOT_CACHE[include_private] = list(PSL_RULES)
    return _PSL_SNAPSHOT_CACHE[include_private]


def _host_of(url_col):
    """Lowercased, trailing-dot-stripped host of a URL column.

    ``try_parse_url`` is Spark's JVM-side URL parser (handles userinfo,
    ports, IPv6 brackets; NULL — not an ANSI error — on junk input);
    oracles replay the same extraction with an RE2/Java-identical
    regexp on well-formed URLs.
    """
    host = F.lower(F.try_parse_url(url_col, F.lit("HOST")))
    return F.nullif(F.regexp_replace(host, r"\.$", ""), F.lit(""))


def registrable_domain(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    host_col: str | None = None,
    suffixes: list[str] | None = None,
) -> DataFrame:
    """Add ``out_col`` = the registrable domain (eTLD+1) of ``url_col``,
    plus ``host_col`` (the bare host) when requested.

    Full PSL algorithm, pure column expressions: split the host on
    dots, match the rule set — literal multi-label suffixes, wildcard
    rules (``*.ck``: any 2-label name under ``ck`` is a suffix), and
    exception rules (``!www.ck``: prevails over every other rule; the
    exception itself IS the registrable domain) — longest match wins,
    exceptions beat everything (publicsuffix.org algorithm, public
    spec); the default rule (suffix = last label) covers unknown TLDs.
    A host that IS a public suffix (``github.io`` itself), a
    single-label host (``localhost``), or an unparseable URL yields
    the host itself / NULL rather than inventing a registrable domain.

    ``suffixes``: rules to use instead of the default — which is the
    bundled full-PSL snapshot (:func:`load_psl_snapshot`, ~9.8k rules,
    curated :data:`PSL_RULES` fallback when the data file is absent);
    single-label literal entries are redundant with the default rule
    and ignored by construction. The rule sets are literals in the
    plan: zero joins, zero shuffles — one combined static InSet per
    rule kind (a matched string's own label count IS its depth), O(1)
    hash probes per candidate tail; beyond ~10k entries prefer
    loading the PSL as a broadcast relation and joining on the probed
    suffix candidates.
    """
    literals: list[str] = []
    wild_bases: list[str] = []
    exceptions: list[str] = []
    max_d = 1
    rules = suffixes if suffixes is not None else load_psl_snapshot()
    for s in rules:
        s = s.strip().lower()
        if s.startswith("!"):
            exceptions.append(s[1:])
            max_d = max(max_d, s[1:].count(".") + 1)
        elif s.startswith("*."):
            wild_bases.append(s[2:])
            max_d = max(max_d, s[2:].count(".") + 2)
        elif "." in s:  # single-label literal = the default rule
            literals.append(s)
            max_d = max(max_d, s.count(".") + 1)
    # Single-pass fold longest-match (r14). Two prior shapes failed at
    # the full snapshot: the per-depth CASE chain inlined a concat per
    # branch per reference, and predicate pushdown re-substituting it
    # into scan filters blew janino's 64 KB method limit (d48b lost
    # whole-stage codegen); a 3-aggregate array formulation was
    # codegen-compact but — higher-order functions being
    # CodegenFallback — re-evaluated the URL-parse/split subtree once
    # per aggregate reference in the interpreter (13× the r12 wall).
    # This shape references every subtree exactly ONCE: zip (index,
    # tail) pairs — tails built in one transform — and fold them
    # ascending through a (exception, suffix-depth, domain-candidate)
    # struct: a rule hit at depth i sets suf (wildcards need the extra
    # label, i < n, and land one deeper; greatest keeps the deepest),
    # the candidate completes one step later (tail(suf+1)) and is
    # INVALIDATED when a deeper match supersedes it mid-loop — a
    # deeper suffix whose +1 tail never arrives (host IS that suffix)
    # must yield the host, not a stale shallower candidate. Exceptions
    # prevail via the final coalesce. Per-row cost: ≤ max-depth+1
    # iterations × 3 static-InSet probes, rule-count-independent.
    # Built as ONE Spark-SQL expression string (single parse): the
    # F.lit/isin route creates one py4j round-trip per rule literal —
    # ~30k JVM calls and 5-6 s of pure plan-CONSTRUCTION per query at
    # the full snapshot; the SQL parser ingests the same ~9.5k-entry
    # IN lists in tens of milliseconds, and Catalyst converts them to
    # static InSets identically either way.
    def q(v: str) -> str:
        return "'" + v.replace("'", "''") + "'"

    def member(t: str, vals: list[str]) -> str:
        if not vals:
            return "false"
        return f"{t} IN ({', '.join(q(v) for v in sorted(vals))})"

    host_sql = (
        f"nullif(regexp_replace(lower(try_parse_url(`{url_col}`, "
        "'HOST')), '\\\\.$', ''), '')"
    )
    labels_sql = f"split({host_sql}, '\\\\.')"
    n_sql = f"size({labels_sql})"
    pairs = (
        f"transform(sequence(1, least({n_sql}, {max_d + 1})), "
        f"i -> named_struct('i', i, 't', "
        f"concat_ws('.', slice({labels_sql}, -i, i))))"
    )
    init = (
        "named_struct('exc', CAST(NULL AS STRING), 'suf', 1, "
        "'dom', CAST(NULL AS STRING))"
    )
    matched = (
        f"CASE WHEN {member('p.t', literals)} THEN p.i "
        f"WHEN p.i < {n_sql} AND {member('p.t', wild_bases)} "
        "THEN p.i + 1 ELSE acc.suf END"
    )
    step = (
        "(acc, p) -> named_struct("
        f"'exc', CASE WHEN {member('p.t', exceptions)} THEN p.t "
        "ELSE acc.exc END, "
        f"'suf', greatest({matched}, acc.suf), "
        f"'dom', CASE WHEN greatest({matched}, acc.suf) != acc.suf "
        "THEN CAST(NULL AS STRING) "
        "WHEN acc.suf = p.i - 1 THEN p.t ELSE acc.dom END)"
    )
    # finish lambda keeps the fold single-reference: exception rules
    # prevail (the exception itself IS the registrable domain); a host
    # that IS a public suffix (dom never completed) or single-label
    # yields the host itself
    fold = (
        f"aggregate({pairs}, {init}, {step}, "
        "a -> coalesce(a.exc, a.dom))"
    )
    dom_sql = (
        f"CASE WHEN {host_sql} IS NULL THEN CAST(NULL AS STRING) "
        f"ELSE coalesce({fold}, {host_sql}) END"
    )
    dom = F.expr(dom_sql)
    host = F.expr(host_sql)
    out = df.withColumn(out_col, dom)
    if host_col:
        out = out.withColumn(host_col, host)
    return out


def url_features(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """URL-level filter signals — the RefinedWeb-style URL scoring
    pass run alongside the domain cap (crawl curation filters on URL
    SHAPE before reading a byte of content: deep calendar/pagination
    paths, parameter-stuffed tracking URLs, binary-asset extensions,
    digit-heavy spam hosts):

    - ``host`` — lowercased host (``try_parse_url``; NULL on junk)
    - ``path_depth`` — non-empty ``/`` path segments
    - ``n_query_params`` — ``&``-separated query parameters
    - ``file_ext`` — lowercased extension of the last path segment
      (1–5 alphanumerics), NULL when none
    - ``is_homepage`` — 1 when the path is ``''``/``'/'`` with no
      query, else 0 (int, not bool: a nullable boolean's NULL turns
      into float NaN in one engine's pandas bridge and None in the
      other, breaking representation-exact comparisons)
    - ``n_host_labels`` — dot-separated host labels
    - ``host_digit_fraction`` — digit chars / host chars, floor-scaled
      1e6 (identical double both engines)
    - ``url_chars`` — raw URL length

    Pure column expressions over Spark's JVM URL parser: one
    projection, fuses into the scan, zero shuffles/joins/UDFs. Every
    feature is NULL-gated on the host: an unparseable or relative URL
    yields NULL across the board (both engines agree by construction
    instead of each guessing at junk)."""
    url = F.col(url_col)
    host = _host_of(url)
    path = F.try_parse_url(url, F.lit("PATH"))
    query = F.try_parse_url(url, F.lit("QUERY"))
    segs = F.filter(
        F.split(F.coalesce(path, F.lit("")), "/"), lambda s: s != ""
    )
    last = F.try_element_at(segs, F.lit(-1))  # NULL on an empty path
    ext = F.lower(
        F.regexp_extract(
            F.coalesce(last, F.lit("")), r"\.([A-Za-z0-9]{1,5})$", 1
        )
    )
    n_host = F.length(host)
    digit_frac = F.when(
        n_host > 0,
        F.floor(
            F.regexp_count(host, F.lit("[0-9]")).cast("double")
            / n_host.cast("double")
            * 1000000.0
            + 0.5
        )
        / 1000000.0,
    ).otherwise(F.lit(0.0))
    gate = lambda c: F.when(host.isNotNull(), c)
    return df.select(
        *df.columns,
        host.alias("host"),
        gate(F.size(segs).cast("int")).alias("path_depth"),
        gate(
            F.when(query.isNull(), F.lit(0))
            .otherwise(F.size(F.split(query, "&")))
            .cast("int")
        ).alias("n_query_params"),
        gate(F.nullif(ext, F.lit(""))).alias("file_ext"),
        gate(
            (
                F.coalesce(path, F.lit("")).isin("", "/") & query.isNull()
            ).cast("int")
        ).alias("is_homepage"),
        gate(F.size(F.split(host, r"\.")).cast("int")).alias(
            "n_host_labels"
        ),
        gate(digit_frac).alias("host_digit_fraction"),
        gate(F.length(url).cast("int")).alias("url_chars"),
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    max_per_domain: int = 1000,
    keep_by: str | None = None,
    id_col: str = "doc_id",
    out_col: str = "domain",
    merge_fanin: int = 1024,
) -> DataFrame:
    """Cap the corpus at ``max_per_domain`` documents per registrable
    domain — the RefinedWeb-style mega-host guard run before content
    dedup. Keeps the BEST ``keep_by`` docs per domain (quality-weighted
    A-Res reservoir: inclusion proportional to the ``keep_by`` column
    within the domain, exact count, deterministic) or, with
    ``keep_by=None``, a deterministic uniform per-domain sample
    (equal-weight A-Res = salted-md5 priority).

    Returns the surviving rows: input columns + ``out_col`` (the
    registrable domain) + ``domain_rank`` (1-based within the domain).
    NULL domains (unparseable URLs) pass through UNCAPPED with
    ``domain_rank`` NULL — curation decides their fate separately
    (usually a drop; this operator must not silently eat them into one
    giant NULL group).

    Skew note (the reason this exists at all): the hot domain IS the
    skewed key. The per-domain top-k runs on the bounded two-phase
    aggregation tree (local top-k per (domain, partition), then
    ``pid div merge_fanin`` fold levels — no merge buffer over
    ``merge_fanin × max_per_domain`` structs, no Window row_number
    funneling the mega-domain through one reducer task).
    """
    from basis_devkit_spark.operators.text import (
        weighted_reservoir_sample_grouped,
    )

    if max_per_domain < 1:
        raise ValueError("max_per_domain must be >= 1")
    with_dom = registrable_domain(df, url_col, out_col=out_col)
    weighted = with_dom.filter(F.col(out_col).isNotNull()).withColumn(
        "__w",
        F.col(keep_by).cast("double") if keep_by else F.lit(1.0),
    )
    winners = weighted_reservoir_sample_grouped(
        weighted,
        "__w",
        max_per_domain,
        group_col=out_col,
        id_col=id_col,
        salt="domcap",
        merge_fanin=merge_fanin,
    ).select(
        out_col, id_col, F.col("rank").alias("domain_rank")
    )
    # Single output pass (r14): ONE left join against the bounded winner
    # relation keeps a row when its domain is NULL (uncapped passthrough
    # — a NULL join key never matches, so domain_rank stays NULL) or it
    # won the reservoir. The previous keeper-join + NULL-side union read
    # ``with_dom`` twice more, re-running the per-row PSL fold for the
    # whole corpus a 3rd time (2 corpus-wide PSL passes total now: the
    # reservoir scan and this one).
    return (
        with_dom.join(winners, [out_col, id_col], "left")
        .filter(F.col(out_col).isNull() | F.col("domain_rank").isNotNull())
        .select(*df.columns, out_col, "domain_rank")
    )


#: Query parameters stripped by :func:`canonical_url` — session/click
#: tracking identifiers that never change the resource (the standard
#: crawl-dedup strip list; all names are public ad/analytics params).
TRACKING_PARAM_RE = (
    r"^(utm_[^=&]*|gclid|fbclid|msclkid|dclid|igshid|mc_cid|mc_eid"
    r"|ref_src|ref_url|_ga|_gl|yclid|wbraid|gbraid|s_kwcid|spm)="
)


def canonical_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    strip_www: bool = True,
    tracking_re: str = TRACKING_PARAM_RE,
) -> DataFrame:
    """URL canonicalization for crawl-level dedup — the normalization
    pass that runs BEFORE URL-keyed dedup/caps so trivially-different
    spellings of one resource collapse: lowercase scheme and host,
    strip userinfo, default ports (http:80 / https:443), fragments,
    trailing path slashes, the ``www.`` host prefix (``strip_www``),
    and tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
    …); surviving query parameters are SORTED byte-wise so parameter
    order stops mattering. Adds ``out_col`` (NULL when the URL has no
    ``scheme://host`` shape — junk stays junk, both engines agree by
    construction).

    Everything is regexp + array expressions shared verbatim with the
    oracle (no JVM URL parser here: the parse must be engine-identical
    character-for-character, so both sides run the same RE2-compatible
    regexps). Pure projection: zero joins, zero shuffles, fuses into
    the scan; compose with ``exact_dedup`` on ``out_col`` for the
    URL-dedup pass."""
    url = F.col(url_col)
    scheme = F.lower(
        F.nullif(
            F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1),
            F.lit(""),
        )
    )
    authority = F.nullif(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1),
        F.lit(""),
    )
    hostport = F.regexp_replace(authority, r"^.*@", "")
    host0 = F.lower(
        F.regexp_replace(
            F.regexp_replace(hostport, r":[0-9]+$", ""), r"\.$", ""
        )
    )
    host = (
        F.regexp_replace(host0, r"^www\.", "") if strip_www else host0
    )
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    path = F.regexp_replace(
        F.regexp_extract(
            url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1
        ),
        r"/+$",
        "",
    )
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(tracking_re),
        )
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit("")),
    )
    out = F.when(
        scheme.isNotNull() & host.isNotNull() & (host != ""), canon
    )
    return df.withColumn(out_col, out)
