#!/usr/bin/env python3
"""Stage a SYNTHETIC IMDB/JOB corpus as parquet fixtures.

The reference's own JOB benchmark (benchmark/imdb/*.benchmark — the
paper's headline workload) loads the real IMDB parquet from a GitHub
release over https, which is unreachable in this sandbox (probed:
DNS-blocked). The 113 verbatim query texts and the 21-table schema DO
ship with the reference (benchmark/imdb_plan_cost/queries/*.sql,
benchmark/imdb_plan_cost/init/schema.sql), so corpus-level SQL parity
is still provable the gate's way: generate a deterministic synthetic
corpus with the EXACT schema, run every verbatim query on both engines
over the identical parquet files, and compare. What this cannot prove
is agreement with the shipped real-data answers (benchmark/imdb/
answers) — documented in JobVerbatim.scala.

Generation strategy — coverage-dense, not uniform-random: JOB queries
conjoin many highly selective predicates over literal values ('top 250
rank', note LIKE '%(co-production)%', keyword IN ('superhero', ...)).
Independent uniform data would make nearly every query empty, which is
weak evidence (both engines trivially agree on NULL). Three layers:

  1. CURATED movies — the titles the queries name ('Shrek 2', 'One
     Piece%', ...) with years/kinds chosen inside the queries' range
     predicates.
  2. RICH movies (400, scale-independent) — per fact table, rows
     covering every query-relevant literal/pattern (extracted from the
     113 texts), years cycling a band list weighted toward the queried
     ranges, links kind-homogeneous so series-to-series link queries
     have support; plus GOLDEN persons (voice actresses with the
     queried name shapes, a Downey, a male writer, a 'D'-pcode male)
     whose cast rows guarantee the deep voice/char/gender conjunctions.
  3. NOISE — uniform rows keeping selectivities low.

All randomness is seeded: the corpus is byte-deterministic per
(seed, scale). Row counts scale linearly; coverage layers are
scale-independent.

Usage: python3 scripts/stage_imdb.py [scale]   (default 1)
"""
import os
import random
import re
import sys

import duckdb
import pandas as pd

SCHEMA = "/root/reference/benchmark/imdb_plan_cost/init/schema.sql"
OUT = os.environ.get("GRAFT_IMDB_ROOT") or os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "imdb")

R = random.Random(17)

# ---------------------------------------------------------------- pools
COMP_CAST_TYPE = ["cast", "crew", "complete", "complete+verified"]
COMPANY_TYPE = ["production companies", "distributors",
                "special effects companies", "miscellaneous companies"]
KIND_TYPE = ["movie", "tv movie", "video movie", "tv series",
             "video game", "episode", "tv mini series"]
ROLE_TYPE = ["actor", "actress", "producer", "writer", "director",
             "cinematographer", "composer", "costume designer", "editor",
             "miscellaneous crew", "production designer", "guest"]
LINK_TYPE = ["follows", "followed by", "remake of", "remade as",
             "references", "referenced in", "spoofs", "spoofed in",
             "features", "featured in", "spin off from", "spin off",
             "version of", "similar to", "edited into", "edited from",
             "alternate language version of", "unknown link"]
INFO_TYPE = ["top 250 rank", "bottom 10 rank", "genres", "countries",
             "rating", "release dates", "budget", "votes", "languages",
             "mini biography", "trivia", "height", "quotes",
             "birth date", "death date", "taglines", "certificates",
             "sound mix", "color info", "runtimes", "birth name",
             "spouse", "where now", "salary history", "nick names",
             "books", "agent address", "biographical movies",
             "portrayed in", "interviews", "article", "magazine cover",
             "pictorial", "death notes", "LD disc format", "LD year",
             "LD digital sound", "LD official retail price",
             "LD frequency response", "LD quality of source"]

GENRES = ["Drama", "Horror", "Western", "Family", "Action", "Sci-Fi",
          "Thriller", "Crime", "Comedy", "Adventure", "Documentary",
          "Animation", "Romance", "Mystery", "War", "Musical", "Short"]
COUNTRIES = ["Germany", "German", "USA", "American", "Sweden", "Swedish",
             "Norway", "Denmark", "Bulgaria", "America", "Japan",
             "France", "UK", "Danish", "Norwegian", "Italy", "Spain"]
# two USA-200x rows carry the '%internet%' note DETERMINISTICALLY (15a/b
# need release-date + internet-note on the SAME movie_info row)
RELEASE_DATES = [
    "USA: 17 February 2005", "USA: 25 December 2008",
    "Japan: 12 May 2007", "Japan: 3 June 2010", "Japan: 21 March 2008",
    "USA: 10 April 1999", "USA: 4 June 2013",
    "Germany: 9 October 2009", "Sweden: 1 January 1995",
    "France: 30 August 2011"]
LANGUAGES = ["English", "German", "Japanese", "Swedish", "French"]
CERTS = ["USA:R", "USA:PG-13", "Germany:16", "Japan:PG-12"]

MC_NOTES = [
    "(co-production)", "(presents)", "(as Metro-Goldwyn-Mayer Pictures)",
    "(2006) (USA) (theatrical)", "(2007) (worldwide) (all media)",
    "(1994) (France) (theatrical)", "(1994) (USA) (VHS)",
    "(2006) (Japan) (DVD)", "(2007) (Japan) (theatrical)",
    "(2008) (Japan) (Blu-ray)", "(2009) (USA) (VHS)",
    "(2012) (worldwide) (TV)", "(uncredited)", "(in association with)"]
CI_NOTES = ["(voice)", "(voice: English version)",
            "(voice: Japanese version)", "(voice) (uncredited)",
            "(producer)", "(executive producer)", "(writer)", "(story)",
            "(screenplay)", "(head writer)", "(written by)",
            "(co-producer)", "(line producer)", "(as Robert Downey Jr.)"]
CHAR_NAMES = ["Queen", "Tony Stark", "Iron Man", "Sherlock Holmes",
              "Spider-Man", "Batman", "Superman", "The Man", "Old Man",
              "Policeman", "Anchorman", "Woman", "King", "Doctor",
              "Sergeant"]
PERSON_NAMES = [
    "Downey, Robert", "Downey Jr., Robert", "Bert, Angel",
    "Angelo, Tim", "Timberlake, Justin", "Yoder, Tim", "Yokin, Bert",
    "Angstrom, Anders", "Bertolucci, Bernardo", "Xavier, Ann",
    "Zeta-Jones, Catherine", "Anderson, Pamela", "Bell, Kristen",
    "Yun-Fat, Chow", "Yu, Jessica", "Young, Angus", "Bang, Bert"]
# (name, country_code): codes chosen to satisfy the queries that pair a
# company NAME with a country ('YouTube' + '[us]', a '[jp]' distributor
# for the anime queries, a '[nl]' company for 33b's tv-series link)
COMPANY_META = [
    ("DreamWorks Animation", "[us]"), ("YouTube", "[us]"),
    ("Warner Bros. Pictures", "[us]"), ("Warner Home Video", "[us]"),
    ("20th Century Fox Home Entertainment", "[us]"),
    ("Twentieth Century Fox Film Corporation", "[us]"),
    ("Lionsgate Films", "[us]"), ("Lionsgate Home Entertainment", "[us]"),
    ("Polygram Filmed Entertainment", "[nl]"),
    ("Universal Film Studio", "[ru]"), ("Best Film Company", "[de]"),
    ("Channel 4 Films", "[gb]"),
    ("Metro-Goldwyn-Mayer Pictures", "[us]"),
    ("Studio Ghibli", "[jp]"), ("Shaw Brothers", "[jp]")]
COUNTRY_CODES = ["[de]", "[nl]", "[us]", "[pl]", "[ru]", "[jp]", "[sm]",
                 "[gb]", "[fr]", "[se]", "[it]", "[hu]"]
KEYWORDS = [
    "10,000-mile-club", "character-name-in-title", "computer-animation",
    "marvel-cinematic-universe", "sequel", "second-part", "hero",
    "martial-arts", "hand-to-hand-combat", "murder", "murder-in-title",
    "blood", "gore", "death", "female-nudity", "violence", "nerd",
    "loner", "alienation", "dignity", "revenge", "based-on-novel",
    "superhero", "marvel-comics", "based-on-comic", "fight",
    "tv-special", "magnet", "web", "claw", "laser", "cult-film"]
# (title, production_year, kind_id) — years INSIDE the queries' range
# predicates ('Shrek 2' BETWEEN 2000 AND 2010; One Piece/Dragon Ball Z
# BETWEEN 2006 AND 2007; murder/Champion/Loser titles past the >2010
# filters; a tv series at exactly 2007 for 33b)
CURATED = [
    ("Shrek 2", 2004, 1), ("Kung Fu Panda", 2008, 1),
    ("Kung Fu Panda 2", 2011, 1), ("The Champion", 2012, 1),
    ("Champion of the Ring", 1998, 1), ("Freddy vs Jason", 2003, 1),
    ("Loser Takes All", 2011, 1), ("The Loser", 2007, 1),
    ("Money Train", 1998, 1), ("Mord in Berlin", 2013, 1),
    ("Iron Fist Champion", 1982, 1),
    ("Scary Movie", 2000, 1),
    ("Murder on the Orient Express", 2011, 1),
    ("A murder story", 2012, 1),
    ("Birdemic: Shock and Terror", 2010, 1),
    ("Dragon Ball Z: Broly", 2007, 4),
    ("One Piece: Strong World", 2006, 4), ("Saw II", 2005, 1),
    ("Vampire Diaries", 2007, 4), ("Iron Man Returns", 2012, 1),
    ("The Dark Champion", 2015, 1)]
# year bands for non-curated rich movies, weighted toward the queried
# ranges (>2010, 2005-2010, =2007, 1950-2000)
YEAR_CYCLE = [2011, 2012, 2013, 2014, 2015, 2007, 2006, 2008, 2005,
              2009, 2010, 2004, 2000, 1998, 1995, 1994, 1990, 1985,
              1975, 1965, 1955, 1950, 1948, 1935]
TITLE_WORDS = ["Return", "Night", "Summer", "Empire", "Secret", "River",
               "Garden", "Winter", "Voyage", "Signal", "Harbor", "Echo",
               "Static", "Crown", "Cinder", "Atlas", "Meadow", "Pilot"]
NAME_FIRST = ["Liam", "Sofia", "Mateo", "Ingrid", "Kenji", "Priya",
              "Hugo", "Elena", "Tomas", "Greta", "Oskar", "Mina"]
NAME_LAST = ["Silva", "Novak", "Eriksen", "Tanaka", "Moreau", "Kovacs",
             "Petrov", "Lindgren", "Costa", "Weber", "Haugen", "Ricci"]

# GOLDEN persons: pid -> (name, gender, pcode_cf). Names shaped for the
# queried LIKE patterns; genders fixed (the voice queries demand 'f'
# with '%An%'-family names, the writer queries 'm').
GOLDEN = {
    991: ("Anderson, Angela", "f", "A5236"),
    992: ("Yolanda, Berta", "f", "Y453"),
    993: ("Downey, Robert", "m", "D52"),
    994: ("Duvall, Mark", "m", "D4521"),
    995: ("Xenakis, Anna", "f", "X52"),
    996: ("Zorro, Bancroft", "m", "Z6"),
    997: ("Bright, Timothy", "m", "B6232"),
}
# golden cast rows per curated movie: (pid, role_id, note, char_id)
# role ids: actor=1 actress=2 producer=3 writer=4; char ids: Queen=1,
# Tony Stark=2, Iron Man=3, Batman=6
GOLDEN_CAST = [
    (991, 2, "(voice)", 1), (991, 2, "(voice: English version)", 2),
    (991, 2, "(voice: Japanese version)", 3),
    (991, 2, "(voice) (uncredited)", 6),
    (992, 2, "(voice: English version)", 2), (992, 2, "(voice)", 1),
    (993, 1, "(voice)", 2), (993, 1, None, 3),
    (993, 1, "(as Robert Downey Jr.)", 2),
    (994, 3, "(producer)", None), (995, 2, "(voice)", 1),
    (996, 1, "(voice: Japanese version)", 8),
    (997, 4, "(writer)", None), (997, 4, "(story)", None),
    (997, 4, "(screenplay)", None),
]


def parse_schema():
    txt = open(SCHEMA).read()
    tables = {}
    for m in re.finditer(r"CREATE TABLE (\w+) \(([^;]*?)\);", txt, re.S):
        cols = []
        for line in m.group(2).strip().splitlines():
            line = line.strip().rstrip(",")
            if not line:
                continue
            name, typ = line.split(None, 1)
            cols.append((name, typ.startswith("integer")))
        tables[m.group(1)] = cols
    assert len(tables) == 21, sorted(tables)
    return tables


def md5ish():
    return "".join(R.choice("0123456789abcdef") for _ in range(32))


def pcode():
    return R.choice("ABCDXZ") + "".join(
        R.choice("123456") for _ in range(R.randint(1, 4)))


def opt(v, p_null):
    return None if R.random() < p_null else v


def build(scale=1.0):
    n_movie = int(24000 * scale)
    n_rich = 400
    n_person = int(16000 * scale)
    n_company = int(5000 * scale)
    n_char = int(8000 * scale)
    n_keyword = int(3000 * scale)
    rich_movies = list(range(1, n_rich + 1))

    t = {}
    t["comp_cast_type"] = dict(id=range(1, 5), kind=COMP_CAST_TYPE)
    t["company_type"] = dict(id=range(1, 5), kind=COMPANY_TYPE)
    t["kind_type"] = dict(id=range(1, 8), kind=KIND_TYPE)
    t["role_type"] = dict(id=range(1, 13), role=ROLE_TYPE)
    t["link_type"] = dict(id=range(1, 19), link=LINK_TYPE)
    t["info_type"] = dict(id=range(1, len(INFO_TYPE) + 1), info=INFO_TYPE)
    it_id = {v: i + 1 for i, v in enumerate(INFO_TYPE)}

    kws = KEYWORDS + [
        f"kw-{R.choice(['city', 'ocean', 'desert', 'forest'])}-{i}"
        for i in range(n_keyword - len(KEYWORDS))]
    t["keyword"] = dict(
        id=range(1, len(kws) + 1), keyword=kws,
        phonetic_code=[pcode() for _ in kws])

    # --- title: curated block, then rich cycle, then noise
    rows = dict(id=[], title=[], imdb_index=[], kind_id=[],
                production_year=[], imdb_id=[], phonetic_code=[],
                episode_of_id=[], season_nr=[], episode_nr=[],
                series_years=[], md5sum=[])
    for i in range(1, n_movie + 1):
        if i <= len(CURATED):
            title, year, kind = CURATED[i - 1]
        elif i <= n_rich:
            base, _, _ = CURATED[i % len(CURATED)]
            title = f"{base} {['II', 'III', 'Returns', 'Begins'][i % 4]}"
            kind = [1, 1, 1, 4, 6, 2, 3][i % 7]
            year = YEAR_CYCLE[i % len(YEAR_CYCLE)]
        else:
            title = (f"{R.choice(TITLE_WORDS)} of the "
                     f"{R.choice(TITLE_WORDS)} {i}")
            kind = R.choice([1, 1, 1, 4, 6, 6])
            year = opt(R.choice(range(1880, 2020)), 0.03)
        episode = kind == 6
        parent = R.randint(1, n_movie) if episode else None
        rows["id"].append(i)
        rows["title"].append(title)
        rows["imdb_index"].append(opt(R.choice(["I", "II", "III"]), 0.9))
        rows["kind_id"].append(kind)
        rows["production_year"].append(year)
        rows["imdb_id"].append(None)
        rows["phonetic_code"].append(pcode())
        rows["episode_of_id"].append(parent)
        rows["season_nr"].append(R.randint(1, 12) if episode else None)
        rows["episode_nr"].append(R.randint(1, 260) if episode else None)
        rows["series_years"].append(
            f"{year}-????" if (episode and year) else None)
        rows["md5sum"].append(md5ish())
    t["title"] = rows
    rich_kind = {m: rows["kind_id"][m - 1] for m in rich_movies}

    # --- name: golden pids fixed, rich block with deterministic gender
    rows = dict(id=[], name=[], imdb_index=[], imdb_id=[], gender=[],
                name_pcode_cf=[], name_pcode_nf=[], surname_pcode=[],
                md5sum=[])
    for i in range(1, n_person + 1):
        if i in GOLDEN:
            nm, g, pc = GOLDEN[i]
        elif i <= 1000:
            nm = PERSON_NAMES[(i - 1) % len(PERSON_NAMES)]
            if i > len(PERSON_NAMES):
                nm = f"{nm} {['Jr.', 'Sr.', 'III'][i % 3]}"
            g, pc = ("f" if i % 2 == 0 else "m"), pcode()
        else:
            nm = f"{R.choice(NAME_LAST)}, {R.choice(NAME_FIRST)}"
            g, pc = opt(R.choice(["m", "f"]), 0.1), pcode()
        rows["id"].append(i)
        rows["name"].append(nm)
        rows["imdb_index"].append(opt("I", 0.95))
        rows["imdb_id"].append(None)
        rows["gender"].append(g)
        rows["name_pcode_cf"].append(pc)
        rows["name_pcode_nf"].append(pcode())
        rows["surname_pcode"].append(pcode())
        rows["md5sum"].append(md5ish())
    t["name"] = rows

    # --- aka_name: every rich/golden person, a third of the rest
    rows = dict(id=[], person_id=[], name=[], imdb_index=[],
                name_pcode_cf=[], name_pcode_nf=[], surname_pcode=[],
                md5sum=[])
    j = 0
    for pid in list(range(1, 1001)) + list(range(1001, n_person + 1, 3)):
        j += 1
        base = t["name"]["name"][pid - 1]
        rows["id"].append(j)
        rows["person_id"].append(pid)
        rows["name"].append(R.choice([f"A. {base}", f"{base} aka",
                                      base.lower(), f"Aka {base}"]))
        rows["imdb_index"].append(None)
        rows["name_pcode_cf"].append(pcode())
        rows["name_pcode_nf"].append(pcode())
        rows["surname_pcode"].append(pcode())
        rows["md5sum"].append(md5ish())
    t["aka_name"] = rows

    # --- char_name
    rows = dict(id=[], name=[], imdb_index=[], imdb_id=[],
                name_pcode_nf=[], surname_pcode=[], md5sum=[])
    for i in range(1, n_char + 1):
        nm = (CHAR_NAMES[(i - 1) % len(CHAR_NAMES)] if i <= 600 else
              f"{R.choice(NAME_FIRST)} the {R.choice(TITLE_WORDS)}")
        rows["id"].append(i)
        rows["name"].append(nm)
        rows["imdb_index"].append(None)
        rows["imdb_id"].append(None)
        rows["name_pcode_nf"].append(pcode())
        rows["surname_pcode"].append(pcode())
        rows["md5sum"].append(md5ish())
    t["char_name"] = rows

    # --- company_name: explicit meta block, then noise
    rows = dict(id=[], name=[], country_code=[], imdb_id=[],
                name_pcode_nf=[], name_pcode_sf=[], md5sum=[])
    for i in range(1, n_company + 1):
        if i <= 240:
            nm, cc = COMPANY_META[(i - 1) % len(COMPANY_META)]
            if i > len(COMPANY_META):
                nm = f"{nm} {['International', 'GmbH', 'Ltd.'][i % 3]}"
        else:
            nm = (f"{R.choice(TITLE_WORDS)} "
                  f"{R.choice(['Media', 'Studios', 'Productions', 'Pictures'])}")
            cc = opt(R.choice(COUNTRY_CODES), 0.15)
        rows["id"].append(i)
        rows["name"].append(nm)
        rows["country_code"].append(cc)
        rows["imdb_id"].append(None)
        rows["name_pcode_nf"].append(pcode())
        rows["name_pcode_sf"].append(pcode())
        rows["md5sum"].append(md5ish())
    t["company_name"] = rows

    # --- cast_info: golden rows on curated movies, dense rich block,
    # uniform noise
    rows = dict(id=[], person_id=[], movie_id=[], person_role_id=[],
                note=[], nr_order=[], role_id=[])
    cid = 0

    def cast_row(pid, mid, role, note, order, char=None):
        nonlocal cid
        cid += 1
        rows["id"].append(cid)
        rows["person_id"].append(pid)
        rows["movie_id"].append(mid)
        rows["person_role_id"].append(
            char if char is not None else opt(R.randint(1, n_char), 0.4))
        rows["note"].append(note)
        rows["nr_order"].append(order)
        rows["role_id"].append(role)

    for mid in range(1, len(CURATED) + 1):
        for gi, (pid, role, note, char) in enumerate(GOLDEN_CAST):
            cast_row(pid, mid, role, note, gi + 1, char)
    for mid in rich_movies:
        for k in range(36):
            pid = 1 + ((mid * 13 + k * 7) % 1000)
            role = 1 + (k % 12)
            note = opt(CI_NOTES[(mid + k) % len(CI_NOTES)], 0.25)
            char = (1 + ((mid + k) % 15)) if k % 3 == 0 else None
            cast_row(pid, mid, role, note, opt(k + 1, 0.3), char)
    for _ in range(int(160000 * scale)):
        cast_row(R.randint(1, n_person), R.randint(1, n_movie),
                 R.randint(1, 12), opt(R.choice(CI_NOTES), 0.7),
                 opt(R.randint(1, 80), 0.3))
    t["cast_info"] = rows

    # --- movie_companies: every rich movie × type × note, alternating
    # between the name-pool companies and the wider 240 block
    rows = dict(id=[], movie_id=[], company_id=[], company_type_id=[],
                note=[])
    j = 0

    def mc_row(mid, comp, ct, note):
        nonlocal j
        j += 1
        rows["id"].append(j)
        rows["movie_id"].append(mid)
        rows["company_id"].append(comp)
        rows["company_type_id"].append(ct)
        rows["note"].append(note)

    for mid in rich_movies:
        for ct in range(1, 5):
            for ni, note in enumerate(MC_NOTES):
                mc_row(mid, 1 + ((mid + ni + ct) % len(COMPANY_META)),
                       ct, note)
                mc_row(mid, 1 + ((mid * 11 + ni * 17 + ct) % 240),
                       ct, note)
            # NULL-note rows: several queries filter mc.note IS NULL
            mc_row(mid, 1 + ((mid + ct) % len(COMPANY_META)), ct, None)
    for _ in range(int(60000 * scale)):
        mc_row(R.randint(1, n_movie), R.randint(1, n_company),
               R.randint(1, 4), opt(R.choice(MC_NOTES), 0.5))
    t["movie_companies"] = rows

    # --- movie_info
    rows = dict(id=[], movie_id=[], info_type_id=[], info=[], note=[])
    j = 0

    def mi_row(mid, itid, info, note=None):
        nonlocal j
        j += 1
        rows["id"].append(j)
        rows["movie_id"].append(mid)
        rows["info_type_id"].append(itid)
        rows["info"].append(info)
        rows["note"].append(note)

    for mid in rich_movies:
        for g in GENRES[:8] + [GENRES[8 + mid % 9]]:
            mi_row(mid, it_id["genres"], g)
        for c in COUNTRIES[: 10 + mid % 7]:
            mi_row(mid, it_id["countries"], c)
        for ri, rd in enumerate(RELEASE_DATES):
            # the two USA-200x rows always carry the internet note
            mi_row(mid, it_id["release dates"], rd,
                   note=("first showing on internet" if ri < 2 else
                         opt("first showing on internet", 0.8)))
        mi_row(mid, it_id["rating"], f"{1 + (mid % 90) / 10.0:.1f}")
        mi_row(mid, it_id["budget"], f"${(mid % 200) + 1},000,000")
        mi_row(mid, it_id["languages"], LANGUAGES[mid % len(LANGUAGES)])
        mi_row(mid, it_id["certificates"], CERTS[mid % len(CERTS)])
    for _ in range(int(110000 * scale)):
        itname = R.choice(["genres", "countries", "release dates",
                           "rating", "votes", "languages", "runtimes",
                           "color info", "taglines"])
        info = {
            "genres": lambda: R.choice(GENRES),
            "countries": lambda: R.choice(COUNTRIES),
            "release dates": lambda: R.choice(RELEASE_DATES),
            "rating": lambda: f"{R.randint(10, 99) / 10.0:.1f}",
            "votes": lambda: str(R.randint(5, 500000)),
            "languages": lambda: R.choice(LANGUAGES),
            "runtimes": lambda: str(R.randint(60, 240)),
            "color info": lambda: R.choice(["Color", "Black and White"]),
            "taglines": lambda: f"The {R.choice(TITLE_WORDS)} returns",
        }[itname]()
        mi_row(R.randint(1, n_movie), it_id[itname], info,
               note=opt("shown on internet", 0.96))
    t["movie_info"] = rows

    # --- movie_info_idx: EVERY rich movie gets rating+votes+both ranks
    rows = dict(id=[], movie_id=[], info_type_id=[], info=[], note=[])
    j = 0

    def mix_row(mid, itid, info):
        nonlocal j
        j += 1
        rows["id"].append(j)
        rows["movie_id"].append(mid)
        rows["info_type_id"].append(itid)
        rows["info"].append(info)
        rows["note"].append(None)

    for mid in rich_movies:
        mix_row(mid, it_id["rating"], f"{1 + (mid % 95) / 10.0:.1f}")
        mix_row(mid, it_id["votes"], str(100 + mid * 37))
        mix_row(mid, it_id["top 250 rank"], str(1 + mid % 250))
        mix_row(mid, it_id["bottom 10 rank"], str(1 + mid % 10))
    for _ in range(int(30000 * scale)):
        mid = R.randint(1, n_movie)
        kind = R.choice(["rating", "votes"])
        mix_row(mid, it_id[kind],
                f"{R.randint(10, 99) / 10.0:.1f}" if kind == "rating"
                else str(R.randint(5, 500000)))
    t["movie_info_idx"] = rows

    # --- movie_keyword: every rich movie × every pool keyword
    rows = dict(id=[], movie_id=[], keyword_id=[])
    j = 0
    for mid in rich_movies:
        for ki in range(len(KEYWORDS)):
            j += 1
            rows["id"].append(j)
            rows["movie_id"].append(mid)
            rows["keyword_id"].append(ki + 1)
    for _ in range(int(70000 * scale)):
        j += 1
        rows["id"].append(j)
        rows["movie_id"].append(R.randint(1, n_movie))
        rows["keyword_id"].append(R.randint(1, len(kws)))
    t["movie_keyword"] = rows

    # --- movie_link: rich→rich, KIND-HOMOGENEOUS (33a/b join tv series
    # to tv series through the link), every link type per movie
    rows = dict(id=[], movie_id=[], linked_movie_id=[], link_type_id=[])
    j = 0
    by_kind = {}
    for m in rich_movies:
        by_kind.setdefault(rich_kind[m], []).append(m)
    for mid in rich_movies:
        peers = by_kind[rich_kind[mid]]
        for lt in range(1, 19):
            j += 1
            rows["id"].append(j)
            rows["movie_id"].append(mid)
            rows["linked_movie_id"].append(
                peers[(peers.index(mid) + lt) % len(peers)])
            rows["link_type_id"].append(lt)
    for _ in range(int(4000 * scale)):
        j += 1
        rows["id"].append(j)
        rows["movie_id"].append(R.randint(1, n_movie))
        rows["linked_movie_id"].append(R.randint(1, n_movie))
        rows["link_type_id"].append(R.randint(1, 18))
    t["movie_link"] = rows

    # --- person_info: every rich/golden person gets 'mini biography'
    # (note 'Volker Boehm') AND 'trivia'; noise for the rest
    rows = dict(id=[], person_id=[], info_type_id=[], info=[], note=[])
    j = 0

    def pi_row(pid, itname, info, note):
        nonlocal j
        j += 1
        rows["id"].append(j)
        rows["person_id"].append(pid)
        rows["info_type_id"].append(it_id[itname])
        rows["info"].append(info)
        rows["note"].append(note)

    for pid in range(1, 1001):
        pi_row(pid, "mini biography",
               f"Born in {R.choice(COUNTRIES)}.", "Volker Boehm")
        pi_row(pid, "trivia",
               f"Collects {R.choice(TITLE_WORDS).lower()}s.",
               opt("Anonymous", 0.5))
        pi_row(pid, "height", f"{R.randint(150, 200)} cm", None)
    for pid in range(1001, min(n_person, int(24000 * scale)) + 1, 2):
        itname = R.choice(["mini biography", "trivia", "height",
                           "quotes", "birth date"])
        pi_row(pid, itname, {
            "mini biography": f"Born in {R.choice(COUNTRIES)}.",
            "trivia": f"Collects {R.choice(TITLE_WORDS).lower()}s.",
            "height": f"{R.randint(150, 200)} cm",
            "quotes": "To be or not to be.",
            "birth date": (f"{R.randint(1920, 1999)}-0{R.randint(1, 9)}"
                           f"-1{R.randint(0, 9)}"),
        }[itname], opt("Anonymous", 0.8))
    t["person_info"] = rows

    # --- complete_cast: ALL subject × status combos per rich movie
    rows = dict(id=[], movie_id=[], subject_id=[], status_id=[])
    j = 0
    for mid in rich_movies:
        for subj in (1, 2):
            for status in (3, 4):
                j += 1
                rows["id"].append(j)
                rows["movie_id"].append(mid)
                rows["subject_id"].append(subj)
                rows["status_id"].append(status)
    for _ in range(int(8000 * scale)):
        j += 1
        rows["id"].append(j)
        rows["movie_id"].append(R.randint(1, n_movie))
        rows["subject_id"].append(R.randint(1, 2))
        rows["status_id"].append(R.randint(3, 4))
    t["complete_cast"] = rows

    # --- aka_title: one per rich movie, then noise
    rows = dict(id=[], movie_id=[], title=[], imdb_index=[], kind_id=[],
                production_year=[], phonetic_code=[], episode_of_id=[],
                season_nr=[], episode_nr=[], note=[], md5sum=[])
    j = 0

    def at_row(mid):
        nonlocal j
        j += 1
        base = t["title"]["title"][mid - 1]
        rows["id"].append(j)
        rows["movie_id"].append(mid)
        rows["title"].append(R.choice(
            [f"{base} (alt)", base.upper(), f"Aka {base}"]))
        rows["imdb_index"].append(None)
        rows["kind_id"].append(t["title"]["kind_id"][mid - 1])
        rows["production_year"].append(
            t["title"]["production_year"][mid - 1])
        rows["phonetic_code"].append(pcode())
        rows["episode_of_id"].append(None)
        rows["season_nr"].append(None)
        rows["episode_nr"].append(None)
        rows["note"].append(opt("working title", 0.5))
        rows["md5sum"].append(md5ish())

    for mid in rich_movies:
        at_row(mid)
    for _ in range(int(6000 * scale)):
        at_row(R.randint(1, n_movie))
    t["aka_title"] = rows

    return t


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    schema = parse_schema()
    data = build(scale)
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for name, cols in sorted(schema.items()):
        rows = data[name]
        want = [c for c, _ in cols]
        assert sorted(rows) == sorted(want), (
            name, sorted(rows), sorted(want))
        df = pd.DataFrame({c: list(rows[c]) for c in want})
        for c, is_int in cols:
            if is_int:
                df[c] = df[c].astype("Int32")
        dest = os.path.join(OUT, f"{name}.parquet")
        con.register("graft_df", df)
        con.execute(
            f"COPY (SELECT * FROM graft_df) TO '{dest}' (FORMAT PARQUET)")
        con.unregister("graft_df")
        print(f"{name}: {len(df)} rows -> {dest}")


if __name__ == "__main__":
    main()
