"""Frozen Public Suffix List snapshot subset.

Source: the Mozilla Public Suffix List (https://publicsuffix.org/list/
— public domain-parsing data, MPL-2.0; snapshot subset transcribed
2025, ICANN + private sections). This is deliberately a SUBSET: the
full list is ~9k rules and would go through a broadcast lookup table
(the ``_apply_blocklist`` DataFrame path in url_curation.py) rather
than in-plan literals; the subset keeps ``registrable_domain`` a pure
whole-stage-codegen expression while implementing the REAL PSL
algorithm — longest-rule-wins over plain, wildcard (``*.X``) and
exception (``!Y``) rules — instead of the r11 last-2/last-3 heuristic
that mis-bucketed ``*.co.uk``-class domains (r11 verdict item 2).

Hosts whose true public suffix is outside the snapshot fall back to
the default ``*`` rule (registrable = last two labels), exactly as the
PSL algorithm prescribes for unknown TLDs.

All tuples are consumed by :func:`typebus_spark.operators.url_curation.
registrable_domain` (Spark) and spliced verbatim into DuckDB oracle SQL
— keep them sorted and literal (no computation) so both engines read
one frozen table.
"""

from __future__ import annotations

# Plain rules with two labels (suffix = last 2 host labels; registrable
# domain = last 3). ICANN section unless noted.
PSL_SUFFIXES_2LABEL: tuple[str, ...] = (
    # .uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # .jp (prefectural/city wildcards are separate, below)
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # .au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # .nz
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "iwi.nz",
    "kiwi.nz", "maori.nz", "mil.nz", "net.nz", "org.nz", "school.nz",
    # .za
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    # .br
    "app.br", "art.br", "blog.br", "com.br", "dev.br", "eco.br",
    "edu.br", "far.br", "gov.br", "ind.br", "inf.br", "jus.br",
    "leg.br", "med.br", "mil.br", "mus.br", "net.br", "org.br",
    "pro.br", "radio.br", "rec.br", "srv.br", "tur.br", "tv.br",
    "vet.br", "wiki.br",
    # .in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in",
    "ind.in", "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # .cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # .kr
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    # .tw
    "club.tw", "com.tw", "edu.tw", "game.tw", "gov.tw", "idv.tw",
    "mil.tw", "net.tw", "org.tw",
    # .mx / Latin America
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar",
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co",
    "org.co",
    "com.ve", "edu.ve", "gob.ve", "mil.ve", "net.ve", "org.ve",
    "web.ve",
    "com.pe", "edu.pe", "gob.pe", "mil.pe", "net.pe", "nom.pe",
    "org.pe",
    "com.ec", "edu.ec", "fin.ec", "gob.ec", "gov.ec", "med.ec",
    "mil.ec", "net.ec", "org.ec", "pro.ec",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py",
    "org.py",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "mil.bo", "net.bo",
    "org.bo", "tv.bo",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt",
    "org.gt",
    "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do",
    "org.do", "web.do",
    # .tr
    "com.tr", "edu.tr", "gov.tr", "mil.tr", "net.tr", "org.tr",
    "web.tr",
    # .il
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
    "net.il", "org.il",
    # .sg / .hk / .my / .th / .id / .ph / .vn
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
    "org.my",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "com.ph", "edu.ph", "gov.ph", "mil.ph", "net.ph", "ngo.ph",
    "org.ph",
    "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    # .pk / .ke / .ng / .eg / .sa / .ae / .ua / .pl
    "com.pk", "edu.pk", "gov.pk", "net.pk", "org.pk",
    "ac.ke", "co.ke", "go.ke", "info.ke", "me.ke", "mobi.ke", "ne.ke",
    "or.ke", "sc.ke",
    "com.ng", "edu.ng", "gov.ng", "mil.ng", "mobi.ng", "name.ng",
    "net.ng", "org.ng", "sch.ng",
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.sa", "edu.sa", "gov.sa", "med.sa", "net.sa", "org.sa",
    "pub.sa", "sch.sa",
    "ac.ae", "co.ae", "gov.ae", "mil.ae", "net.ae", "org.ae", "sch.ae",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "mil.pl",
    "net.pl", "org.pl", "waw.pl",
    # assorted European second-levels
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "org.pt",
    "publ.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "com.ro", "org.ro",
    "co.hu", "info.hu", "org.hu", "priv.hu",
    "ac.at", "co.at", "gv.at", "or.at",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "edu.it", "gov.it",
    # private section (hosting platforms — each customer subdomain is
    # an independent registrable domain)
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "blogspot.in",
    "herokuapp.com", "appspot.com", "netlify.app", "vercel.app",
    "pages.dev", "web.app", "firebaseapp.com", "azurewebsites.net",
    "cloudfront.net", "wordpress.com", "weebly.com", "wixsite.com",
    "readthedocs.io", "onrender.com", "fly.dev", "surge.sh",
    "neocities.org", "glitch.me",
)

# Plain rules with three labels (registrable domain = last 4 labels).
PSL_SUFFIXES_3LABEL: tuple[str, ...] = (
    # .edu.au state systems (ICANN)
    "act.edu.au", "catholic.edu.au", "nsw.edu.au", "nt.edu.au",
    "qld.edu.au", "sa.edu.au", "tas.edu.au", "vic.edu.au", "wa.edu.au",
    # private section
    "blogspot.co.uk", "blogspot.com.au", "blogspot.com.br",
    "blogspot.co.nz", "blogspot.co.za",
    "s3.amazonaws.com",
)

# Wildcard rules ``*.X`` where X is a single label: every direct child
# of X is itself a public suffix (registrable = last 3 labels).
PSL_WILDCARD_BASES_1LABEL: tuple[str, ...] = (
    "bd", "ck", "er", "fk", "jm", "kh", "mm", "np", "pg",
)

# Wildcard rules ``*.X`` where X is two labels (registrable = last 4).
PSL_WILDCARD_BASES_2LABEL: tuple[str, ...] = (
    "kawasaki.jp", "kitakyushu.jp", "kobe.jp", "nagoya.jp",
    "sapporo.jp", "sendai.jp", "yokohama.jp",
)

# Exception rules ``!Y``: Y itself is NOT a public suffix even though a
# wildcard matches it — Y is the registrable domain of any host under
# or equal to it. Split by label count for the CASE dispatch.
PSL_EXCEPTIONS_2LABEL: tuple[str, ...] = ("www.ck",)
PSL_EXCEPTIONS_3LABEL: tuple[str, ...] = (
    "city.kawasaki.jp", "city.kitakyushu.jp", "city.kobe.jp",
    "city.nagoya.jp", "city.sapporo.jp", "city.sendai.jp",
    "city.yokohama.jp",
)


def sql_in_list(values: tuple[str, ...]) -> str:
    """``'a', 'b', ...`` — literal IN-list body, identical in Spark SQL
    and DuckDB (values are frozen hostname labels: no quoting hazards,
    asserted here so a future edit cannot silently break the splice)."""
    assert all("'" not in v and "\\" not in v for v in values), values
    return ", ".join(f"'{v}'" for v in values)
