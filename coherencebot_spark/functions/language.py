"""language-identifier plugin: HTML language detection + indexing filter.

Reference parity (all whole-stage-codegen column expressions):

* ``LANG_MAPPINGS`` — the ISO-639 alias table from
  ``src/plugin/language-identifier/.../langmappings.properties`` (public
  ISO-639 data; each two-letter key maps to itself plus every
  lowercased alias — ``HTMLLanguageParser.java:69-88``).  Lines are
  applied in file order, so a later line's alias wins a collision
  (``mlt`` → ``mt``, ``scr`` → ``sh``); the Java ``Properties``
  enumeration order is hash-dependent, so file order is the
  deterministic choice.
* ``parse_language`` — ``HTMLLanguageParser.LanguageParser.parseLanguage``
  (``HTMLLanguageParser.java:298-322``): split multi-valued strings on
  ``,| |;|.|(|)|=``, take each token's primary subtag (before ``-`` /
  ``_``), lowercase, and return the first token that maps to a known
  ISO-639 code.
* ``detect_language`` — the ``detect`` policy
  (``HTMLLanguageParser.java:142-156`` + ``LanguageParser`` DOM scan
  ``:215-293``): raw parse-metadata short-circuit (``dc.language`` →
  ``content-language`` → ``lang``), then the document scan with
  priority html ``lang`` attribute > ``<meta name="dc.language">`` >
  ``<meta http-equiv="content-language">`` (each "first value that
  parses"), then the raw ``Content-Language`` response header.
* ``identify_language`` — the ``identify`` policy
  (``HTMLLanguageParser.java:161-196``): statistical identification of
  ``title + " " + text`` truncated to ``lang.analyze.max.length``.  The
  Tika n-gram profile model is replaced by this repo's stopword-vote
  heuristic (same tables as ``datapipe.text_quality.STOPWORDS``); the
  ``lang.identification.only.certain`` knob becomes a minimum-hits
  threshold (zero hits is always "unable to identify" → NULL).
* ``html_language_filter`` — the policy dispatch
  (``HTMLLanguageParser.java:108-136``): ``lang.extraction.policy``
  ordering decides which of detect/identify runs first and which is the
  fallback; the winner lands in the ``lang`` key of the parse-metadata
  map (only when non-null, ``:131-134``).
* ``language_index_filter`` — ``LanguageIndexingFilter.java:64-87``:
  ``lang`` = parse-meta language else ``Content-Language`` header; with
  a non-empty ``lang.index.languages`` set, documents whose language is
  not in the set (including unknown) are dropped; the indexed value is
  cut to the 2-letter primary code.

AWS Comprehend escalation (``comprehendLanguage``) is a network call to
a paid external service — out of the sandbox's scope, mirrored by the
injectable ``identify`` fallback position in the policy list.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..datapipe.text_quality import STOPWORDS

__all__ = [
    "LANG_MAPPINGS",
    "parse_language",
    "detect_language",
    "identify_language",
    "html_language_filter",
    "language_index_filter",
]

# langmappings.properties, verbatim (data table, not code): two-letter
# ISO-639-1 key = comma-separated aliases (639-2 codes + English names).
_LANGMAPPINGS_PROPERTIES = """\
aa=aar,Afar
ab=abk,Abkhazian
ae=ave
af=afr,Afrikaans
ak=aka
am=amh,Amharic
an=arg
ar=ara,Arabic
as=asm,Assamese
av=ava
ay=aym,Aymara
az=aze,Azerbaijani
ba=bak,Bashkir
be=bel,Byelorussian
bg=bul,Bulgarian
bh=bih,Bihari
bi=bis,Bislama
bm=bam
bn=ben,Bengali
bo=bod,tib,Tibetan
br=bre,Breton
bs=bos
ca=cat,Catalan
ce=che
ch=cha
co=cos,Corsican
cr=cre
cs=ces,cze,Czech
cu=chu
cv=chv
cy=cym,wel,Welsh
da=dan,Danish
de=deu,ger,German
dv=div
dz=dzo,Dzongkha
ee=ewe
el=ell,gre,Greek
en=eng,English
eo=epo,Esperanto
es=esl,spa,Spanish
et=est,Estonian
eu=baq,eus,Basque
fa=fas,per,Persian
ff=ful
fi=fin,Finnish
fj=fij,Fijian
fo=fao,Faroese
fr=fra,fre,French
fy=fry,Frisian
ga=gai,iri,Irish
gd=gla
gl=glg,Gallegan
gn=grn,Guarani
gu=guj,Gujarati
gv=glv
ha=hau,Hausa
he=heb,Hebrew
hi=hin,Hindi
ho=hmo
hr=scr,hrv,Croatian
ht=hat
hu=hun,Hungarian
hy=arm,hye,Armenian
hz=her
ia=ina,Interlingua
id=ind,Indonesian
ie=ile
ig=ibo
ii=iii
ik=ipk,Inupiak
io=ido
is=ice,isl,Icelandic
it=ita,Italian
iu=iku,Inuktitut
ja=jpn,Japanese
jv=jw,jav,jaw,Javanese
ka=geo,kat,Georgian
kg=kon
ki=kik
kj=kua
kk=kaz,Kazakh
kl=kal,Greenlandic
km=khm,Khmer
kn=kan,Kannada
ko=kor,Korean
kr=kau
ks=kas,Kashmiri
ku=kur,Kurdish
kv=kom
kw=cor
ky=kir,Kirghiz
la=lat,Latin
lb=ltz
lg=lug
li=lim
ln=lin,Lingala
lo=lao,Lao
lt=lit,Lithuanian
lu=lub
lv=lav,Latvian
mg=mlg,Malagasy
mh=mah
mi=mao,mri,Maori
mk=mac,mak,Macedonian
ml=mal,mlt,Maltese
mn=mon,Mongolian
mo=mol,Moldavian
mr=mar,Marathi
ms=may,msa,Malay
mt=mlt
my=bur,mya,Burmese
na=nau,Nauru
nb=nob
nd=nde
ne=nep,Nepali
ng=ndo
nl=dut,nla,Dutch
nn=nno
no=nor,Norwegian
nr=nbl
nv=nav
ny=nya
oc=oci,Langue d'Oc
oj=oji
om=orm,Oromo
or=ori,Oriya
os=oss
pa=pan,Panjabi
pi=pli
pl=pol,Polish
ps=pus,Pushto
pt=por,Portuguese
qu=que,Quechua
rm=roh,Rhaeto-Romance
rn=run,Rundi
ro=ron,rum,Romanian
ru=rus,Russian
rw=kin,Kinyarwanda
sa=san,Sanskrit
sc=srd
sd=snd,Sindhi
se=sme
sg=sag,Sango
sh=scr,Serbo-Croatian
si=sin,Singhalese
sk=slk,slo,Slovak
sl=slv,Slovenian
sm=smo,Samoan
sn=sna,Shona
so=som,Somali
sq=alb,sqi,Albanian
sr=scc,srp,Serbian
ss=ssw,Siswant
st=sot,Sotho
su=sun,Sudanese
sv=sve,swe,Swedish,Svenska,Sweden
sw=swa,Swahili
ta=tam,Tamil
te=tel,Telugu
tg=tgk,Tajik
th=tha,Thai
ti=tir,Tigrinya
tk=tuk,Turkmen
tl=tgl,Tagalog
tn=tsn,Tswana
to=tog,Tonga
tr=tur,Turkish
ts=tso,Tsonga
tt=tat,Tatar
tw=twi,Twi
ty=tah
ug=uig,Uighur
uk=ukr,Ukrainian
ur=urd,Urdu
uz=uzb,Uzbek
ve=ven
vi=vie,Vietnamese
vo=vol,Volapk
wa=wln
wo=wol,Wolof
xh=xho,Xhosa
yi=yidYiddish
yo=yor,Yoruba
za=zha,Zhuang
zh=chi,zho,Chinese
zu=zul,Zulu
"""


def _parse_mappings(props: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in props.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        key, _, values = line.partition("=")
        key = key.strip()
        out[key] = key
        for alias in values.split(","):
            out[alias.strip().lower()] = key
    return out


LANG_MAPPINGS: dict[str, str] = _parse_mappings(_LANGMAPPINGS_PROPERTIES)

# one foldable literal, parsed JVM-side once per query plan; none of the
# aliases contain ':' or ',' so the delimiters are safe
_MAP_LIT = ",".join(f"{alias}:{code}" for alias, code in LANG_MAPPINGS.items())

# Java String.split(",| |;|\\.|\\(|\\)|=") — a literal space, not \s
_TOKEN_DELIMS = r",| |;|\.|\(|\)|="


def _alias_map() -> Column:
    return F.str_to_map(F.lit(_MAP_LIT), F.lit(","), F.lit(":"))


def parse_language(lang: Column) -> Column:
    """ISO-639 primary code for a (possibly multi-valued) language
    string, or NULL — LanguageParser.parseLanguage semantics: first
    delimiter-split token whose primary subtag is a known code."""
    m = _alias_map()
    prim = F.transform(
        F.split(lang, _TOKEN_DELIMS, -1),
        lambda t: F.lower(F.split(F.split(t, "-", 2)[0], "_", 2)[0]),
    )
    return F.get(F.filter(F.transform(prim, lambda t: F.try_element_at(m, t)),
                          lambda c: c.isNotNull()), 0)


# <tag ... lang="..."> — \slang keeps xml:lang / hreflang from matching,
# exactly what Element.getAttribute("lang") sees.  Same regex-over-HTML
# tradeoff as html_fields._attr.
_LANG_ATTR = r"""(?is)<[a-z][a-z0-9]*[^>]*\slang\s*=\s*("[^"]*"|'[^']*'|[^\s"'>]+)"""
_META_TAG = r"(?is)<meta\s([^>]*?)/?>"


def _attr(blob: Column, name: str) -> Column:
    dq = F.regexp_extract(blob, rf'(?i){name}\s*=\s*"([^"]*)"', 1)
    sq = F.regexp_extract(blob, rf"(?i){name}\s*=\s*'([^']*)'", 1)
    uq = F.regexp_extract(blob, rf"(?i){name}\s*=\s*([^\s\"'>]+)", 1)
    return F.when(dq != "", dq).when(sq != "", sq).otherwise(uq)


def _first_parsed(values: Column) -> Column:
    """First element that parseLanguage resolves — the DOM walk keeps
    scanning while a slot is still null (LanguageParser.parse)."""
    return F.get(F.filter(F.transform(values, parse_language),
                          lambda c: c.isNotNull()), 0)


def detect_language(html: Column,
                    content_language: Column | None = None,
                    parse_meta: Column | None = None) -> Column:
    """The ``detect`` policy: raw parse-meta short-circuit, then the
    document scan (lang attr > dc.language > http-equiv, each "first
    value that parses"), then the raw Content-Language header."""
    attr_vals = F.transform(
        F.regexp_extract_all(html, F.lit(_LANG_ATTR), 1),
        lambda v: F.regexp_replace(v, "^[\"']|[\"']$", ""))
    blobs = F.regexp_extract_all(html, F.lit(_META_TAG), 1)
    dc = F.transform(
        F.filter(blobs, lambda b: F.lower(_attr(b, "name")) == "dc.language"),
        lambda b: _attr(b, "content"))
    he = F.transform(
        F.filter(blobs,
                 lambda b: F.lower(_attr(b, "http-equiv")) == "content-language"),
        lambda b: _attr(b, "content"))
    parts: list[Column] = []
    if parse_meta is not None:
        parts += [F.try_element_at(parse_meta, F.lit(k))
                  for k in ("dc.language", "content-language", "lang")]
    parts.append(F.coalesce(_first_parsed(attr_vals), _first_parsed(dc),
                            _first_parsed(he)))
    if content_language is not None:
        parts.append(content_language)
    return F.coalesce(*parts)


def identify_language(title: Column, text: Column,
                      content_maxlength: int = -1,
                      min_hits: int = 1) -> Column:
    """Statistical identification of title+text (stopword vote, ties
    broken by the lexicographically-larger code); NULL below
    ``min_hits`` — the only-certain analogue."""
    blob = F.concat(F.coalesce(title, F.lit("")), F.lit(" "),
                    F.coalesce(text, F.lit("")))
    if content_maxlength >= 0:
        blob = F.substring(blob, 1, content_maxlength)
    hits = [
        F.struct(
            F.size(F.regexp_extract_all(
                blob, F.lit(r"(?i)\b(" + "|".join(ws) + r")\b"),
                F.lit(1))).alias("n"),
            F.lit(lang).alias("lang"))
        for lang, ws in STOPWORDS.items()
    ]
    best = F.array_max(F.array(*hits))
    return F.when(best["n"] >= min_hits, best["lang"])


def html_language_filter(policy: Sequence[str] = ("detect", "identify"),
                         content_maxlength: int = -1,
                         only_certain: bool = False,
                         html_col: str = "html",
                         title_col: str | None = "title",
                         text_col: str = "text",
                         header_col: str | None = None,
                         meta_col: str = "parse_meta"):
    """Parse-filter transform: run the configured extraction policy and
    merge the winner into ``parse_meta['lang']`` (non-null only).

    ``policy`` mirrors ``lang.extraction.policy`` — position decides
    which of detect/identify runs first, the other is the null
    fallback; a single-entry policy runs alone.
    """
    detect_i = policy.index("detect") if "detect" in policy else -1
    identify_i = policy.index("identify") if "identify" in policy else -1
    if detect_i < 0 and identify_i < 0:
        raise ValueError(
            "lang.extraction.policy must contain 'detect' and/or 'identify'")
    min_hits = 3 if only_certain else 1

    def _apply(df: DataFrame) -> DataFrame:
        header = F.col(header_col) if header_col else None
        title = (F.col(title_col)
                 if title_col and title_col in df.columns else F.lit(""))
        det = detect_language(F.col(html_col), header) if detect_i >= 0 else None
        ident = (identify_language(title, F.col(text_col), content_maxlength,
                                   min_hits)
                 if identify_i >= 0 else None)
        if det is not None and ident is not None:
            lang = (F.coalesce(det, ident) if detect_i < identify_i
                    else F.coalesce(ident, det))
        else:
            lang = det if det is not None else ident
        tag = F.when(lang.isNotNull(),
                     F.create_map(F.lit("lang"), lang)
                     ).otherwise(F.create_map().cast("map<string,string>"))
        if meta_col in df.columns:
            merged = F.map_concat(
                F.map_filter(
                    F.coalesce(F.col(meta_col),
                               F.create_map().cast("map<string,string>")),
                    lambda k, _: ~F.array_contains(F.map_keys(tag), k)),
                tag)
            return df.withColumn(meta_col, merged)
        return df.withColumn(meta_col, tag)

    return _apply


def language_index_filter(index_langs: Sequence[str] = (),
                          meta_col: str = "parse_meta",
                          header_col: str | None = None,
                          out_col: str = "lang"):
    """Indexing-filter transform: add the 2-letter ``lang`` field; with
    a non-empty ``index_langs`` set, drop documents whose language
    (parse-meta else header, pre-truncation) is not in the set —
    unknown-language documents included."""
    langs = [str(l) for l in index_langs]

    def _apply(doc: DataFrame) -> DataFrame:
        lang = F.try_element_at(F.col(meta_col), F.lit("lang"))
        if header_col and header_col in doc.columns:
            lang = F.coalesce(lang, F.col(header_col))
        if langs:
            doc = doc.filter(lang.isin(langs))
        return doc.withColumn(out_col, F.substring(lang, 1, 2))

    return _apply
