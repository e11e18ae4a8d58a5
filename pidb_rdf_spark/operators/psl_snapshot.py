"""Bundled snapshot of the Public Suffix List (publicsuffix.org —
public data, Mozilla-maintained, MPL 2.0) for registrable-domain
grouping in :mod:`pidb_rdf_spark.operators.urls`.

This is a CURATED SUBSET, not the full list: it covers the multi-label
ICANN registry suffixes of the major crawl-volume economies (uk, au,
jp incl. all 47 prefectures and the city wildcards, br, in, cn, kr,
nz, za, tw, hk, sg, il, tr, mx, ar, th, my, id, ph, vn, pl, ua, eg,
sa, ae, ng, ke, us state hierarchies, ca provinces) plus the
highest-traffic PRIVATE-section hosting suffixes (blogspot.com,
github.io, …) where each subdomain is a distinct publisher. Suffixes
not in the snapshot fall back to the PSL default rule ``*`` (the bare
TLD is the public suffix — i.e. last-two-labels grouping, the
pre-r12 behavior). Callers with the full list pass it via
``registrable_domain_col(..., psl=rules)`` in PSL rule syntax
(``co.uk``, ``*.ck``, ``!www.ck``).

Rule semantics implemented (https://publicsuffix.org/list/ algorithm):
exception rules win outright; otherwise the matching rule with the
most labels wins; the registrable domain is the public suffix plus
one label.
"""

from __future__ import annotations

_JP_PREFECTURES = [
    "aichi", "akita", "aomori", "chiba", "ehime", "fukui", "fukuoka",
    "fukushima", "gifu", "gunma", "hiroshima", "hokkaido", "hyogo",
    "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima", "kanagawa",
    "kochi", "kumamoto", "kyoto", "mie", "miyagi", "miyazaki",
    "nagano", "nagasaki", "nara", "niigata", "oita", "okayama",
    "okinawa", "osaka", "saga", "saitama", "shiga", "shimane",
    "shizuoka", "tochigi", "tokushima", "tokyo", "tottori", "toyama",
    "wakayama", "yamagata", "yamaguchi", "yamanashi",
]

_JP_CITY_WILDCARDS = [
    "kawasaki", "kitakyushu", "kobe", "nagoya", "sapporo", "sendai",
    "yokohama",
]

_US_STATES = [
    "al", "ak", "az", "ar", "ca", "co", "ct", "de", "dc", "fl", "ga",
    "hi", "id", "il", "in", "ia", "ks", "ky", "la", "me", "md", "ma",
    "mi", "mn", "ms", "mo", "mt", "ne", "nv", "nh", "nj", "nm", "ny",
    "nc", "nd", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "vt", "va", "wa", "wv", "wi", "wy", "pr", "gu", "vi", "as",
]

_CA_PROVINCES = [
    "ab", "bc", "mb", "nb", "nf", "nl", "ns", "nt", "nu", "on", "pe",
    "qc", "sk", "yk",
]

_ICANN = [
    # ---- United Kingdom ----
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk",
    "sch.uk", "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # ---- Australia ----
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "id.au", "info.au", "conf.au", "act.au", "nsw.au", "nt.au",
    "qld.au", "sa.au", "tas.au", "vic.au", "wa.au",
    # ---- Japan (second-level + prefectures; city wildcards below) --
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # ---- New Zealand ----
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "mil.nz", "iwi.nz",
    "health.nz", "parliament.nz", "cri.nz",
    # ---- South Africa ----
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "edu.za",
    "web.za", "mil.za", "nom.za", "law.za",
    # ---- Brazil ----
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "adv.br", "arq.br", "art.br", "bio.br", "blog.br", "eco.br",
    "eng.br", "inf.br", "jus.br", "med.br", "tv.br", "wiki.br",
    # ---- India ----
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "nic.in", "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    # ---- China ----
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "mil.cn", "bj.cn", "sh.cn", "tj.cn", "cq.cn", "gd.cn", "zj.cn",
    "js.cn", "sd.cn", "fj.cn", "hb.cn", "hn.cn", "sc.cn", "ln.cn",
    # ---- South Korea ----
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr",
    "seoul.kr", "busan.kr", "incheon.kr", "daegu.kr", "daejeon.kr",
    "gwangju.kr", "ulsan.kr", "jeju.kr",
    # ---- Taiwan ----
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw",
    "idv.tw", "game.tw", "ebiz.tw", "club.tw",
    # ---- Hong Kong ----
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    # ---- Singapore ----
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    # ---- Israel ----
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "idf.il", "k12.il",
    # ---- Turkey ----
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "mil.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr",
    "info.tr", "k12.tr", "name.tr", "pol.tr", "tel.tr", "tv.tr",
    "web.tr",
    # ---- Mexico ----
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    # ---- Argentina ----
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar",
    "int.ar", "mil.ar", "tur.ar", "musica.ar",
    # ---- Thailand ----
    "co.th", "ac.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    # ---- Malaysia ----
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    # ---- Indonesia ----
    "co.id", "net.id", "org.id", "web.id", "sch.id", "ac.id",
    "go.id", "mil.id", "my.id", "biz.id", "desa.id", "or.id",
    "ponpes.id",
    # ---- Philippines ----
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph", "i.ph",
    # ---- Vietnam ----
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    # ---- Poland ----
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "wroc.pl", "krakow.pl", "poznan.pl", "lodz.pl",
    "gda.pl", "gdansk.pl", "slupsk.pl", "szczecin.pl", "lublin.pl",
    # ---- Ukraine ----
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "kyiv.ua", "lviv.ua", "odessa.ua", "kharkiv.ua",
    "dnipro.ua", "donetsk.ua", "crimea.ua",
    # ---- Russia (regional ICANN entries) ----
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru", "nov.ru",
    # ---- Egypt ----
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg",
    "eun.eg", "mil.eg", "name.eg",
    # ---- Saudi Arabia ----
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
    "edu.sa", "sch.sa",
    # ---- UAE ----
    "co.ae", "net.ae", "org.ae", "gov.ae", "ac.ae", "sch.ae",
    "mil.ae",
    # ---- Nigeria ----
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "i.ng",
    "mil.ng", "mobi.ng", "name.ng", "sch.ng",
    # ---- Kenya ----
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    # ---- Canada (gc + provinces) ----
    "gc.ca",
]

_ICANN += [f"{p}.jp" for p in _JP_PREFECTURES]
_ICANN += [f"{p}.ca" for p in _CA_PROVINCES]
_ICANN += [f"{s}.us" for s in _US_STATES]
_ICANN += [
    f"{lvl}.{s}.us" for s in _US_STATES for lvl in ("k12", "cc", "lib")
]

# PRIVATE-section hosting suffixes where every subdomain is a distinct
# publisher — exactly what a per-domain crawl quota wants to group by
_PRIVATE = [
    "blogspot.com", "github.io", "githubusercontent.com", "gitlab.io",
    "herokuapp.com", "appspot.com", "netlify.app", "vercel.app",
    "pages.dev", "web.app", "firebaseapp.com", "azurewebsites.net",
    "cloudfront.net", "s3.amazonaws.com", "wordpress.com",
    "tumblr.com", "weebly.com", "wixsite.com", "readthedocs.io",
    "surge.sh", "glitch.me", "repl.co", "neocities.org",
]

# Wildcard rules (``*.ck``: every direct child is a public suffix)
# and their exceptions (``!www.ck``: www.ck is registrable after all)
_WILDCARDS = ["ck", "jm", "bd", "kh", "pg", "er", "fk", "mm", "np"]
_WILDCARDS += [f"{c}.jp" for c in _JP_CITY_WILDCARDS]
_EXCEPTIONS = ["www.ck"]
_EXCEPTIONS += [f"city.{c}.jp" for c in _JP_CITY_WILDCARDS]

SNAPSHOT_RULES: tuple[str, ...] = tuple(
    sorted(set(_ICANN) | set(_PRIVATE))
    + sorted(f"*.{w}" for w in set(_WILDCARDS))
    + sorted(f"!{e}" for e in set(_EXCEPTIONS))
)
