"""Deterministic synthetic Common-Crawl-style Polish corpus.

Shaped exactly per the driver input hint:
``pages(url string, warc_ts timestamp, html binary, text string, lang
string)`` plus the normalized gold-annotation table
``page_relations(url, e1_id, e2_id, rel_class)`` (the engine-side form of
the reference's ``{doc_id: {(e1,e2): class}}`` dict,
/root/reference/DataProvider.py:66-91).

Everything is a pure function of (seed, page index), generated
*distributively* with ``spark.range(n) -> mapInPandas`` so the bench can
materialize millions of pages without a driver bottleneck. Properties
baked in for the test plan (FIXTURES.md):

* ~20% of pages live on one hot domain (salting/skew exercise),
* inline ``<entity id="tag.N" category="chan_nam">surface</entity>``
  annotation in the SemEval convention (readers.py:255-261),
* entity surfaces drawn from inflectional variant sets so the
  lemma-based canonicalizer has real work to do,
* sentences with 0, 1, 2, 3 and 16+ entities (pair-cap edges,
  readers.py:323,496),
* a few non-Polish pages (language-filter exercise),
* html is a fixed wrapper around ``text`` so HTML->text extraction is
  exactly invertible (byte-identical per url - driver invariant).
"""

from __future__ import annotations

import datetime as _dt
from random import Random
from typing import Iterator

import pandas as pd

from ..functions.kernels import stable_seed

SEED = 42
HOT_DOMAIN = "hot.example.pl"

HTML_PREFIX = (
    '<html><head><meta charset="utf-8"/><title>strona</title></head>'
    "<body><article>"
)
HTML_SUFFIX = "</article></body></html>"

# --- entity inventory: base form -> inflectional variants -------------------
PERSONS = {
    "Adam Kowalski": ["Adam Kowalski", "Adama Kowalskiego", "Adamowi Kowalskiemu"],
    "Maria Nowak": ["Maria Nowak", "Marii Nowak", "Marię Nowak"],
    "Jan Wiśniewski": ["Jan Wiśniewski", "Jana Wiśniewskiego"],
    "Anna Lewandowska": ["Anna Lewandowska", "Anny Lewandowskiej"],
    "Piotr Zieliński": ["Piotr Zieliński", "Piotra Zielińskiego"],
    "Ewa Kamińska": ["Ewa Kamińska", "Ewy Kamińskiej"],
    "Tomasz Mazur": ["Tomasz Mazur", "Tomasza Mazura"],
    "Katarzyna Wójcik": ["Katarzyna Wójcik", "Katarzyny Wójcik"],
}
CITIES = {
    "Warszawa": ["Warszawa", "Warszawie", "Warszawy"],
    "Kraków": ["Kraków", "Krakowie", "Krakowa"],
    "Gdańsk": ["Gdańsk", "Gdańsku", "Gdańska"],
    "Poznań": ["Poznań", "Poznaniu", "Poznania"],
    "Wrocław": ["Wrocław", "Wrocławiu", "Wrocławia"],
    "Lublin": ["Lublin", "Lublinie", "Lublina"],
}
COUNTRIES = {
    "Polska": ["Polska", "Polsce", "Polski"],
    "Niemcy": ["Niemcy", "Niemczech"],
    "Francja": ["Francja", "Francji"],
    "Czechy": ["Czechy", "Czechach"],
}
ORGS = {
    "Orlen": ["Orlen", "Orlenie", "Orlenu"],
    "Allegro": ["Allegro"],
    "CD Projekt": ["CD Projekt", "CD Projekcie"],
    "Uniwersytet Warszawski": ["Uniwersytet Warszawski", "Uniwersytecie Warszawskim"],
    "Politechnika Gdańska": ["Politechnika Gdańska", "Politechnice Gdańskiej"],
}
FACILITIES = {
    "Zamek Królewski": ["Zamek Królewski", "Zamku Królewskim"],
    "Stadion Narodowy": ["Stadion Narodowy", "Stadionie Narodowym"],
    "Hala Stulecia": ["Hala Stulecia", "Hali Stulecia"],
}

CHANNELS = {
    "person_nam": PERSONS,
    "city_nam": CITIES,
    "country_nam": COUNTRIES,
    "org_nam": ORGS,
    "facility_nam": FACILITIES,
}

# --- relation templates: (rel_class, subj_chan, predicate, obj_chan) --------
# The predicate phrase between the two mentions is the deterministic signal
# the relation scorer keys on (the engine's stand-in for the reference's
# trained classifier - same query surface, deterministic kernel).
REL_TEMPLATES = [
    ("lives_in", "person_nam", "mieszka w", "city_nam"),
    ("born_in", "person_nam", "urodził się w", "city_nam"),
    ("works_for", "person_nam", "pracuje w", "org_nam"),
    ("located_in", "city_nam", "leży w", "country_nam"),
    ("part_of", "facility_nam", "znajduje się w", "city_nam"),
    ("cooperates_with", "org_nam", "współpracuje z", "org_nam"),
]

# predicate lemma-phrase -> relation class (broadcast into the scorer)
PREDICATE_PATTERNS = {pred: rel for rel, _, pred, _ in REL_TEMPLATES}

FILLERS = [
    "Pogoda była wyjątkowo słoneczna tego dnia.",
    "Wieczorem odbył się koncert muzyki dawnej.",
    "Nikt nie spodziewał się takiego obrotu spraw.",
    "Raport zostanie opublikowany w przyszłym tygodniu.",
]

NON_PL = [
    ("en", "The quick brown fox jumps over the lazy dog near the river bank."),
    ("de", "Der schnelle braune Fuchs springt über den faulen Hund am Fluss."),
    ("en", "Results will be published next week according to the committee."),
]


def _pick(rng: Random, d: dict):
    base = sorted(d)[rng.randrange(len(d))]
    variants = d[base]
    return base, variants[rng.randrange(len(variants))]


def build_page(idx: int, seed: int = SEED):
    """Pure function (seed, idx) -> (page row dict, [relation row dicts])."""
    rng = Random(stable_seed("page", seed, idx))
    tag = f"d{idx}"
    if idx % 17 == 13:  # non-Polish page
        lang, text = NON_PL[idx % len(NON_PL)]
        rels = []
    else:
        lang = "pl"
        ent_counter = 0
        sent_texts = []
        rels = []

        def mark(chan, base, surface):
            nonlocal ent_counter
            ent_counter += 1
            eid = f"{tag}.{ent_counter}"
            return eid, f'<entity id="{eid}" category="{chan}">{surface}</entity>'

        n_rel_sents = 1 + rng.randrange(3)
        for _ in range(n_rel_sents):
            rel_class, s_chan, pred, o_chan = REL_TEMPLATES[
                rng.randrange(len(REL_TEMPLATES))
            ]
            s_base, s_surf = _pick(rng, CHANNELS[s_chan])
            o_base, o_surf = _pick(rng, CHANNELS[o_chan])
            if s_chan == o_chan and s_base == o_base:
                continue
            e1, m1 = mark(s_chan, s_base, s_surf)
            e2, m2 = mark(o_chan, o_base, o_surf)
            sent_texts.append(f"{m1} {pred} {m2}.")
            rels.append({"e1_id": e1, "e2_id": e2, "rel_class": rel_class})

        if rng.random() < 0.5:  # multi-entity sentence with no annotated rel
            people = sorted(PERSONS)
            a = people[rng.randrange(len(people))]
            b = people[(people.index(a) + 1) % len(people)]
            _, ma = mark("person_nam", a, PERSONS[a][0])
            _, mb = mark("person_nam", b, PERSONS[b][0])
            sent_texts.append(f"Na konferencji spotkali się {ma} oraz {mb}.")
        if idx % 97 == 7:  # >=15 entities: pair-cap edge (readers.py:496)
            marks = []
            for k in range(16):
                names = sorted(PERSONS)
                nm = names[k % len(names)]
                _, mk = mark("person_nam", nm, PERSONS[nm][0])
                marks.append(mk)
            sent_texts.append("W spotkaniu udział wzięli " + ", ".join(marks) + ".")
        sent_texts.append(FILLERS[rng.randrange(len(FILLERS))])
        # cross-sentence annotation: must be DROPPED by the same-sentence
        # containment rule (readers.py:510 - both ids in one sentence)
        if idx % 11 == 3 and len(rels) >= 2:
            rels.append(
                {
                    "e1_id": rels[0]["e1_id"],
                    "e2_id": rels[1]["e2_id"],
                    "rel_class": rels[0]["rel_class"],
                }
            )
        rng.shuffle(sent_texts)
        text = " ".join(sent_texts)

    if idx % 5 == 0:
        url = f"https://{HOT_DOMAIN}/artykul/{idx}"
    else:
        url = f"https://w{idx % 211}.example.pl/doc/{idx}"
    warc_ts = _dt.datetime(2026, 1, 1) + _dt.timedelta(
        seconds=(idx * 37) % (7 * 86400)
    )
    html = (HTML_PREFIX + text + HTML_SUFFIX).encode("utf-8")
    page = {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}
    for r in rels:
        r["url"] = url
    return page, rels


def synth_pages(spark, n_pages: int, seed: int = SEED, partitions: int | None = None):
    """Distributed generation: (pages_df, page_relations_df)."""
    from .. import schemas

    partitions = partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_pages, numPartitions=partitions)

    def gen_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [build_page(int(i), seed)[0] for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    def gen_rels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rows.extend(build_page(int(i), seed)[1])
            yield pd.DataFrame(
                rows, columns=["url", "e1_id", "e2_id", "rel_class"]
            )

    pages = base.mapInPandas(gen_pages, schema=schemas.PAGES)
    rels = base.mapInPandas(gen_rels, schema=schemas.PAGE_RELATIONS)
    return pages, rels


def synth_pages_local(n_pages: int, seed: int = SEED):
    """Driver-side generation for tests / the plain-Python oracle."""
    pages, rels = [], []
    for i in range(n_pages):
        p, r = build_page(i, seed)
        pages.append(p)
        rels.extend(r)
    return pages, rels
