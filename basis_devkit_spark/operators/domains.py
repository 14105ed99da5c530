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

    ``suffixes``: rules to use instead of the built-in
    :data:`PSL_RULES` — in production pass the real snapshot through
    :func:`parse_psl` (single-label literal entries are redundant with
    the default rule and ignored by construction). The rule sets are
    literals in the plan: zero joins, zero shuffles; beyond ~10k
    entries prefer loading the PSL as a broadcast relation and joining
    on the probed suffix candidates.
    """
    literals: dict[int, list[str]] = {}
    wild_bases: dict[int, list[str]] = {}
    exceptions: dict[int, list[str]] = {}
    for s in suffixes or PSL_RULES:
        s = s.strip().lower()
        if s.startswith("!"):
            e = s[1:]
            exceptions.setdefault(e.count(".") + 1, []).append(e)
        elif s.startswith("*."):
            b = s[2:]
            wild_bases.setdefault(b.count(".") + 1, []).append(b)
        elif "." in s:  # single-label literal = the default rule
            literals.setdefault(s.count(".") + 1, []).append(s)
    host = _host_of(F.col(url_col))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tail = lambda d: F.concat_ws(".", F.slice(labels, -d, d))
    # Longest-match first, one branch per suffix depth. Membership is
    # `isin` — Catalyst turns a >10-element literal list into a static
    # InSet, so codegen stays compact however many suffixes are loaded
    # (a literal-map lookup re-expanded per branch blew past janino's
    # method limits and knocked the projection out of whole-stage
    # codegen). `n > d` strict: a host that IS a public suffix falls
    # through to the otherwise-host branch.
    dom = F.when(host.isNull(), F.lit(None).cast("string"))
    # exception rules prevail over every other match (PSL algorithm):
    # the suffix is the exception minus its leftmost label, so the
    # exception itself is the registrable domain
    for d in sorted(exceptions, reverse=True):
        dom = dom.when((n >= d) & tail(d).isin(*exceptions[d]), tail(d))
    depths = sorted(
        set(literals) | {b + 1 for b in wild_bases}, reverse=True
    )
    for d in depths:
        conds = []
        if d in literals:
            conds.append(tail(d).isin(*literals[d]))
        if (d - 1) in wild_bases:
            conds.append(tail(d - 1).isin(*wild_bases[d - 1]))
        cond = conds[0] if len(conds) == 1 else conds[0] | conds[1]
        dom = dom.when((n > d) & cond, tail(d + 1))
    # PSL default rule: unknown TLD -> the last label is the suffix
    dom = dom.when(n > 1, tail(2)).otherwise(host)
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
    capped_side = with_dom.filter(F.col(out_col).isNotNull())
    null_side = with_dom.filter(F.col(out_col).isNull()).withColumn(
        "domain_rank", F.lit(None).cast("int")
    )
    weighted = capped_side.withColumn(
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
    kept = capped_side.join(winners, [out_col, id_col]).select(
        *df.columns, out_col, "domain_rank"
    )
    return kept.unionByName(
        null_side.select(*df.columns, out_col, "domain_rank")
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
