"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md §1).

Schema matches the BASELINE.json input_hint exactly:
``pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``.

The generator plants ~``n_entities`` ground-truth entities with 1-6 pages
each. Page variants exercise everything the feature stack must absorb:
diacritics vs folded spellings, surname-first reorder, aliases, dates at
year/month/day precision, missing fields, shared profile URLs, Zipfian
domain skew. ~5% of entities get an adversarial doppelganger: same name
tokens, different dates and URLs — those pairs must NOT link.

Everything is seeded (numpy RandomState) — same inputs every run, no wall
clock, no external data.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from soweego_spark.functions import textnorm

FIRST_NAMES = [
    "José", "François", "Björk", "Antonín", "Søren", "Zoë", "László",
    "Miloš", "Agnès", "Jürgen", "Niño", "Pëtr", "Małgorzata", "Çetin",
    "Štefan", "Renée", "Ólafur", "Dūta", "Alice", "Robert", "Carmen",
    "Diego", "Elena", "Viktor", "Ingrid", "Marco", "Nadia", "Oscar",
    "Paula", "Quentin", "Rosa", "Stefan", "Tereza", "Umberto", "Vera",
    "Walter", "Ximena", "Yann", "Zofia", "Henrik",
]
LAST_NAMES = [
    "Dvořák", "Müller", "Sørensen", "Żółkiewski", "Čapek", "García",
    "Fernández", "Kovačić", "Nagy", "Þórsson", "Ōta", "Přemysl",
    "Ångström", "Ibáñez", "Küçük", "Łasica", "Němec", "Ørsted",
    "Šimek", "Úbeda", "Anderson", "Baker", "Carter", "Dawson", "Ellis",
    "Foster", "Grant", "Harris", "Irwin", "Jensen", "Keller", "Larson",
    "Mason", "Nolan", "Olsen", "Parker", "Quinn", "Reyes", "Silva",
    "Turner", "Vargas", "Watson", "Young", "Zimmer", "Okafor", "Ito",
    "Chen", "Silvestri", "Marchetti", "Romano", "Moreau", "Lefèvre",
    "Dubois", "Rossi", "Bianchi", "Novák", "Horváth", "Kowalski",
    "Petrov", "Иванов",
]
OCCUPATIONS = [
    "singer", "composer", "guitarist", "drummer", "producer", "conductor",
    "pianist", "violinist", "songwriter", "arranger", "rapper", "dj",
    "bassist", "trumpeter", "saxophonist", "cellist", "organist",
    "flutist", "bandleader", "lyricist", "remixer", "vocalist",
    "percussionist", "accordionist", "harpist", "clarinetist", "oboist",
    "banjoist", "mandolinist", "sitarist",
]
GENRES = [
    "rock", "jazz", "blues", "folk", "classical", "electronic", "punk",
    "metal", "reggae", "soul", "funk", "disco", "ambient", "techno",
    "house", "opera", "tango", "salsa", "bluegrass", "gospel",
]
PLACES = [
    "Prague", "Vienna", "Lisbon", "Oslo", "Reykjavik", "Warsaw", "Naples",
    "Seville", "Marseille", "Hamburg", "Porto", "Gdansk", "Brno", "Graz",
]
PROFILE_HOSTS = ["catalog-a.example", "catalog-b.example", "id-hub.example"]


def _zipf_domains(rng: np.random.RandomState, n: int = 200) -> np.ndarray:
    hosts = np.array([f"site{i:03d}.example" for i in range(n)])
    # Zipfian popularity: domain i drawn with weight 1/(i+1).
    weights = 1.0 / np.arange(1, n + 1)
    return hosts, weights / weights.sum()


def _slug(text: str) -> str:
    toks = textnorm.tokenize(text, frozenset())
    return "-".join(toks) or "page"


def _date_str(y: int, m: int, d: int, precision: int) -> str:
    if precision == 9:
        return f"{y:04d}"
    if precision == 10:
        return f"{y:04d}-{m:02d}"
    return f"{y:04d}-{m:02d}-{d:02d}"


@dataclass
class PagesFixture:
    pages: pd.DataFrame
    truth: pd.DataFrame            # (url, entity_id)
    labeled_pairs: pd.DataFrame    # (url_a, url_b, block_key, label)
    expected_clusters: pd.DataFrame  # (url, cluster_id) = min-url per entity
    occupation_closure: pd.DataFrame = field(default=None)  # (code, related)


def generate_pages(n_entities: int = 600, seed: int = 42) -> PagesFixture:
    rng = np.random.RandomState(seed)
    hosts, host_p = _zipf_domains(rng)

    entities = []
    eid = 0
    for _ in range(n_entities):
        first = FIRST_NAMES[rng.randint(len(FIRST_NAMES))]
        last = LAST_NAMES[rng.randint(len(LAST_NAMES))]
        y = int(rng.randint(1890, 2000))
        m = int(rng.randint(1, 13))
        d = int(rng.randint(1, 29))
        died = None
        if rng.rand() < 0.4:
            dy = y + int(rng.randint(30, 90))
            died = (min(dy, 2020), int(rng.randint(1, 13)), int(rng.randint(1, 29)))
        occs = list(
            rng.choice(OCCUPATIONS, size=rng.randint(1, 4), replace=False)
        )
        gens = list(rng.choice(GENRES, size=rng.randint(1, 4), replace=False))
        place = PLACES[rng.randint(len(PLACES))]
        profile_host = PROFILE_HOSTS[rng.randint(len(PROFILE_HOSTS))]
        profile_url = (
            f"https://{profile_host}/artist/{_slug(first + ' ' + last)}-{eid:05d}"
        )
        entities.append(
            dict(
                eid=eid, first=first, last=last, born=(y, m, d), died=died,
                occs=occs, gens=gens, place=place, profile=profile_url,
                alias=None,
            )
        )
        eid += 1

    # ~5% adversarial doppelgangers: same name, different everything else.
    n_adv = max(1, n_entities // 20)
    for i in range(n_adv):
        src = entities[int(rng.randint(len(entities)))]
        y = src["born"][0]
        # Force a different year so the date feature can separate them.
        y2 = int(y + rng.randint(5, 40) * (1 if rng.rand() < 0.5 else -1))
        profile_host = PROFILE_HOSTS[int(rng.randint(len(PROFILE_HOSTS)))]
        entities.append(
            dict(
                eid=eid, first=src["first"], last=src["last"],
                born=(y2, int(rng.randint(1, 13)), int(rng.randint(1, 29))),
                died=None,
                occs=list(rng.choice(OCCUPATIONS, size=2, replace=False)),
                gens=list(rng.choice(GENRES, size=2, replace=False)),
                place=PLACES[int(rng.randint(len(PLACES)))],
                profile=(
                    f"https://{profile_host}/artist/"
                    f"{_slug(src['first'] + ' ' + src['last'])}-{eid:05d}"
                ),
                alias=None,
            )
        )
        eid += 1

    rows, truth_rows = [], []
    base_ts = pd.Timestamp("2019-01-01")
    for ent in entities:
        n_pages = int(rng.randint(1, 7))
        full = f"{ent['first']} {ent['last']}"
        for p in range(n_pages):
            variant = rng.rand()
            if variant < 0.55:
                display = full
            elif variant < 0.75:
                display = f"{ent['last']}, {ent['first']}"  # surname first
            elif variant < 0.9:
                display = textnorm.normalize(full)[0]  # ASCII-folded spelling
            else:
                display = f"{ent['first']} '{ent['occs'][0].title()}' {ent['last']}"

            # Date precision varies per page: year / month / day.
            prec = int(rng.choice([9, 10, 11], p=[0.2, 0.2, 0.6]))
            born_s = _date_str(*ent["born"], prec)
            died_s = None
            if ent["died"] is not None and rng.rand() < 0.8:
                dprec = int(rng.choice([9, 11], p=[0.3, 0.7]))
                died_s = _date_str(*ent["died"], dprec)

            include_occ = rng.rand() < 0.85
            include_gen = rng.rand() < 0.8
            include_profile = rng.rand() < 0.8
            extra_links = [
                f"https://{hosts[int(rng.choice(len(hosts), p=host_p))]}/ref/{int(rng.randint(1e6))}"
                for _ in range(int(rng.randint(0, 3)))
            ]
            links = ([ent["profile"]] if include_profile else []) + extra_links

            parts = [f"{display}."]
            parts.append(f"Born {born_s}.")
            if died_s:
                parts.append(f"Died {died_s}.")
            if include_occ:
                parts.append("Occupations: " + ", ".join(ent["occs"]) + ".")
            if include_gen:
                parts.append("Genres: " + ", ".join(ent["gens"]) + ".")
            parts.append(
                f"A noted {ent['occs'][0]} from {ent['place']} appreciated worldwide."
            )
            if links:
                parts.append("Links: " + " ".join(links))
            text = " ".join(parts)

            domain = hosts[int(rng.choice(len(hosts), p=host_p))]
            url = f"https://{domain}/{_slug(display)}-{p}{rng.randint(16**4):04x}"
            html = (
                f"<html><body><h1>{display}</h1><p>{text}</p></body></html>"
            ).encode("utf8")
            ts = base_ts + pd.Timedelta(seconds=int(rng.randint(0, 94608000)))
            lang = (
                "en" if rng.rand() < 0.9
                else ["de", "fr", "es", "it"][int(rng.randint(4))]
            )
            rows.append((url, ts, html, text, lang))
            truth_rows.append((url, ent["eid"]))

    pages = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    ).drop_duplicates("url")
    truth = pd.DataFrame(truth_rows, columns=["url", "entity_id"])
    truth = truth[truth.url.isin(pages.url)]

    labeled = _labeled_pairs(truth, entities, rng)
    clusters = (
        truth.groupby("entity_id")["url"]
        .transform("min")
        .to_frame("cluster_id")
        .assign(url=truth["url"])[["url", "cluster_id"]]
    )
    closure = _occupation_closure(rng)
    return PagesFixture(pages, truth, labeled, clusters, closure)


def _block_token(entity) -> str:
    toks = textnorm.tokenize(
        f"{entity['first']} {entity['last']}", textnorm.NAME_STOPWORDS
    )
    return toks[-1] if toks else ""


def _labeled_pairs(truth: pd.DataFrame, entities, rng) -> pd.DataFrame:
    by_ent = truth.groupby("entity_id")["url"].apply(list)
    ent_by_id = {e["eid"]: e for e in entities}
    pos = []
    for ent_id, urls in by_ent.items():
        key = _block_token(ent_by_id[ent_id])
        urls = sorted(urls)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                pos.append((urls[i], urls[j], key, 1))

    # Negatives: cross-entity pairs sharing a name token (the doppelgangers
    # plus same-surname entities) and random pairs.
    token_to_ents: dict[str, list[int]] = {}
    for e in entities:
        token_to_ents.setdefault(_block_token(e), []).append(e["eid"])
    neg = []
    for key, ents in token_to_ents.items():
        if len(ents) < 2:
            continue
        for i in range(len(ents)):
            for j in range(i + 1, len(ents)):
                ua = by_ent.get(ents[i], [])
                ub = by_ent.get(ents[j], [])
                for a in ua[:3]:
                    for b in ub[:3]:
                        lo, hi = min(a, b), max(a, b)
                        neg.append((lo, hi, key, 0))
    df = pd.DataFrame(
        pos + neg, columns=["url_a", "url_b", "block_key", "label"]
    ).drop_duplicates(["url_a", "url_b"])
    return df


def _occupation_closure(rng) -> pd.DataFrame:
    """Static sub/superclass closure over the occupation vocabulary —
    replaces the reference's live SPARQL expansion (features.py:511-538)."""
    related = []
    for i, occ in enumerate(OCCUPATIONS):
        ups = rng.choice(OCCUPATIONS, size=rng.randint(1, 4), replace=False)
        related.append((occ, sorted(set([occ] + list(ups)))))
    return pd.DataFrame(related, columns=["code", "related"])


def pages_to_spark(spark, fixture: PagesFixture):
    """Lift the fixture to Spark DataFrames."""
    pages = spark.createDataFrame(fixture.pages)
    truth = spark.createDataFrame(fixture.truth)
    labeled = spark.createDataFrame(fixture.labeled_pairs)
    clusters = spark.createDataFrame(fixture.expected_clusters)
    return pages, truth, labeled, clusters
