"""Fifth SPICE gold corpus — verbatim-distribution COCO captions, the
held-out measurement set for the round-5 dependency-parser extractor
(VERDICT r4 next-round #1).

Like the fourth corpus (tests/test_spice_coco.py), captions are taken
from COCO val2014-style annotation sets (transcribed per image group;
each group below is one image's caption set) so the text distribution is
the real eval workload.  This set deliberately includes the constructions
the chunker has never seen in a gold corpus: raising/light-verb chains
("seems to be parked", "getting ready to serve"), reciprocal pronoun
objects ("next to each other"), "close up of" degenerate heads,
"stove top oven" compounds that collide with the multiword-preposition
lexicon, -ly adverbs next to participles, and repeated-noun relations
("a car ... behind a ... parked car").

Annotation discipline (same as all prior corpora): gold graphs were
hand-derived per Anderson et al. 2016 semantics from the documented
conventions BEFORE any parser/model/rule code for round 5 was written,
and are never edited to fit extractor behavior.  Conventions (identical
to the earlier corpora):

* objects = head nouns as written (plural preserved);
* adjectives / compound-noun modifiers / numbers / attributive and
  copular participles = attributes;
* prepositions (incl. multiword "on top of", "next to") = relations with
  nearest-preceding-NP attachment; verb relations absorb their
  preposition into a 3-tuple; of-NPs chain and containers locate, but
  the content noun acts ("a bunch of bananas SITTING ..." -> bananas sit);
* pronouns (incl. "each other" and clause subjects "he"/"it") are NOT
  resolved -- tuples needing them are dropped, their NP content remains;
* control/raising verbs keep a 2-tuple on the subject only when they are
  contentful ("preparing"); light raising chains ("seems to be", "getting
  ready to") contribute the predicate only;
* -ly adverbs and existential "there is/are" are dropped;
* both sides Porter-stemmed for comparison.

Attachment ambiguities annotated SEMANTICALLY (flagged per the corpus-4
discipline): the two surfboard captions annotate (man, on top of,
surfboard) rather than the syntactic nearest-NP (wave, on top of,
surfboard) -- a human scene-graph annotator puts the rider on the board.

First measurement of the CHUNKER extractor on this corpus (2026-08-19,
annotate-before-run, no code changed): **P=0.899 R=0.927**, 12/31
captions diverging — raising chains ("seems to be parked" emitted
degree-adverb objects), pronoun clause subjects kept as relation labels
("as he performs"), "close up" headed by "close", reciprocal "each
other" as a relation target, relative-clause of-chain subjects ("food
that includes"), copular VP coordination ("is clean and has"), and the
two surfboard attachment ambiguities.  The dependency-parser extractor's
first measurement is recorded in its own test once built; per the
protocol this file is committed BEFORE the parser exists.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Each entry: (caption, gold tuple set).  Groups of captions from the same
# image are kept adjacent; tests/test_jvm_parity.py can reuse these groups
# as (refs, hypothesis) corpora for the Java-SPICE comparison.
COCO_VAL5_GOLD = [
    # --- skateboarder at a skate park ------------------------------------
    ("A man riding a skateboard up the side of a ramp.",
     {("man",), ("skateboard",), ("side",), ("ramp",),
      ("man", "riding", "skateboard"), ("skateboard", "up", "side"),
      ("side", "of", "ramp")}),
    ("A young man doing a trick on a skateboard at a skate park.",
     {("man",), ("man", "young"), ("trick",), ("skateboard",),
      ("park",), ("park", "skate"), ("man", "doing", "trick"),
      ("trick", "on", "skateboard"), ("skateboard", "at", "park")}),
    ("A skateboarder jumps into the air as he performs a skateboard trick.",
     {("skateboarder",), ("air",), ("trick",), ("trick", "skateboard"),
      ("skateboarder", "jumps", "air")}),
    # --- living room -------------------------------------------------------
    ("A living room filled with furniture and a flat screen tv.",
     {("room",), ("room", "living"), ("furniture",), ("tv",),
      ("tv", "flat"), ("tv", "screen"), ("room", "filled", "furniture"),
      ("room", "filled", "tv")}),
    ("A living room with a couch a table and a television.",
     {("room",), ("room", "living"), ("couch",), ("table",),
      ("television",), ("room", "with", "couch"), ("room", "with", "table"),
      ("room", "with", "television")}),
    ("The living room is clean and has a very large flat screen tv.",
     {("room",), ("room", "living"), ("room", "clean"), ("tv",),
      ("tv", "large"), ("tv", "flat"), ("tv", "screen"),
      ("room", "has", "tv")}),
    # --- giraffes ------------------------------------------------------------
    ("A couple of giraffes standing next to each other.",
     {("couple",), ("giraffes",), ("couple", "of", "giraffes"),
      ("giraffes", "standing")}),
    ("Two giraffes standing in a grassy field next to trees.",
     {("giraffes",), ("giraffes", "two"), ("field",), ("field", "grassy"),
      ("trees",), ("giraffes", "standing", "field"),
      ("field", "next to", "trees")}),
    ("Two giraffes eating leaves from the top of a tree.",
     {("giraffes",), ("giraffes", "two"), ("leaves",), ("top",), ("tree",),
      ("giraffes", "eating", "leaves"), ("leaves", "from", "top"),
      ("top", "of", "tree")}),
    # --- kitchen -------------------------------------------------------------
    ("A kitchen with a stove top oven next to a white fridge.",
     {("kitchen",), ("oven",), ("oven", "stove"), ("oven", "top"),
      ("fridge",), ("fridge", "white"), ("kitchen", "with", "oven"),
      ("oven", "next to", "fridge")}),
    ("A kitchen filled with appliances and wooden cabinets.",
     {("kitchen",), ("appliances",), ("cabinets",), ("cabinets", "wooden"),
      ("kitchen", "filled", "appliances"),
      ("kitchen", "filled", "cabinets")}),
    ("An empty kitchen with white and blue walls.",
     {("kitchen",), ("kitchen", "empty"), ("walls",), ("walls", "white"),
      ("walls", "blue"), ("kitchen", "with", "walls")}),
    # --- surfer (semantic attachment: rider on board) ------------------------
    ("A man riding a wave on top of a surfboard.",
     {("man",), ("wave",), ("surfboard",), ("man", "riding", "wave"),
      ("man", "on top of", "surfboard")}),
    ("A surfer rides on a wave as it crests.",
     {("surfer",), ("wave",), ("surfer", "rides", "wave")}),
    ("A young man riding a wave on top of a white surfboard.",
     {("man",), ("man", "young"), ("wave",), ("surfboard",),
      ("surfboard", "white"), ("man", "riding", "wave"),
      ("man", "on top of", "surfboard")}),
    # --- teddy bear ------------------------------------------------------------
    ("A teddy bear sitting on top of a wooden bench.",
     {("bear",), ("bear", "teddy"), ("bench",), ("bench", "wooden"),
      ("bear", "sitting", "bench")}),
    ("A brown teddy bear sitting next to a red rose.",
     {("bear",), ("bear", "brown"), ("bear", "teddy"), ("rose",),
      ("rose", "red"), ("bear", "sitting", "rose")}),
    ("A stuffed animal is laying on a wooden bench.",
     {("animal",), ("animal", "stuffed"), ("bench",), ("bench", "wooden"),
      ("animal", "laying", "bench")}),
    # --- train -------------------------------------------------------------------
    ("A train is traveling down the tracks near a train station.",
     {("train",), ("tracks",), ("station",), ("station", "train"),
      ("train", "traveling", "tracks"), ("tracks", "near", "station")}),
    ("A long passenger train traveling over a small bridge.",
     {("train",), ("train", "long"), ("train", "passenger"), ("bridge",),
      ("bridge", "small"), ("train", "traveling", "bridge")}),
    ("There is a train crossing over a bridge by the water.",
     {("train",), ("bridge",), ("water",), ("train", "crossing", "bridge"),
      ("bridge", "by", "water")}),
    # --- plate of food -------------------------------------------------------------
    ("A close up of a plate of food with broccoli.",
     {("up",), ("up", "close"), ("plate",), ("food",), ("broccoli",),
      ("up", "of", "plate"), ("plate", "of", "food"),
      ("food", "with", "broccoli")}),
    ("A white plate topped with meat and vegetables.",
     {("plate",), ("plate", "white"), ("meat",), ("vegetables",),
      ("plate", "topped", "meat"), ("plate", "topped", "vegetables")}),
    ("A plate of food that includes broccoli and bread.",
     {("plate",), ("food",), ("broccoli",), ("bread",),
      ("plate", "of", "food"), ("food", "includes", "broccoli"),
      ("food", "includes", "bread")}),
    # --- tennis ------------------------------------------------------------------------
    ("A woman holding a tennis racquet on a tennis court.",
     {("woman",), ("racquet",), ("racquet", "tennis"), ("court",),
      ("court", "tennis"), ("woman", "holding", "racquet"),
      ("racquet", "on", "court")}),
    ("A tennis player getting ready to serve the ball.",
     {("player",), ("player", "tennis"), ("ball",), ("player", "ready"),
      ("player", "serve", "ball")}),
    ("A man swings his racket as he stands on one foot.",
     {("man",), ("racket",), ("man", "swings", "racket"), ("foot",),
      ("foot", "one")}),
    # --- double decker bus ----------------------------------------------------------------
    ("A double decker bus driving down a city street.",
     {("bus",), ("bus", "double"), ("bus", "decker"), ("street",),
      ("street", "city"), ("bus", "driving", "street")}),
    ("A red double decker bus parked next to tall buildings.",
     {("bus",), ("bus", "red"), ("bus", "double"), ("bus", "decker"),
      ("buildings",), ("buildings", "tall"),
      ("bus", "parked", "buildings")}),
    # --- singletons ---------------------------------------------------------------------------
    ("A car that seems to be parked illegally behind a legally parked car",
     {("car",), ("car", "parked"), ("car", "behind", "car")}),
    ("A bunch of bananas sitting on top of a wooden table.",
     {("bunch",), ("bananas",), ("table",), ("table", "wooden"),
      ("bunch", "of", "bananas"), ("bananas", "sitting", "table")}),
]


def _prf(gold, extract):
    from clipcap_tpu.eval.porter import porter_stem
    from clipcap_tpu.eval.tokenization import ptb_tokenize_line

    def stem_set(ts):
        return {tuple(porter_stem(w) for w in t) for t in ts}

    tp = fp = fn = 0
    misses = []
    for caption, want in gold:
        got_s = stem_set(extract(ptb_tokenize_line(caption)))
        want_s = stem_set(want)
        tp += len(got_s & want_s)
        fp += len(got_s - want_s)
        fn += len(want_s - got_s)
        if got_s != want_s:
            misses.append((caption, sorted(want_s - got_s),
                           sorted(got_s - want_s)))
    return tp / max(1, tp + fp), tp / max(1, tp + fn), misses


def test_spice_extractor_coco5_parser_heldout():
    """FIRST MEASUREMENT of the dependency-parser extractor on this
    held-out corpus (2026-08-19): **P=0.953 R=0.948**, 9/31 captions
    diverging — vs the chunker's P=0.899 R=0.927 — with the annotations
    untouched since the pre-parser commit.  Residuals: the two surfboard
    attachment ambiguities (annotated semantically), "close up of" of-chain
    hops, raising-chain 3-tuples ("seems to be parked behind" emits the
    verb-absorbed (car, parked, car) where the gold chose the preposition),
    coordinated-amod PP predicates ("with white and blue walls"), and
    "getting ready" light-verb attributes.  Floors pinned at 0.92 (the
    VERDICT r4 target) to leave room for treebank drift without letting
    regressions through."""
    from clipcap_tpu.eval.spice_parser import extract_tuples_parsed

    precision, recall, _ = _prf(COCO_VAL5_GOLD, extract_tuples_parsed)
    assert len(COCO_VAL5_GOLD) >= 30
    assert precision >= 0.92, (precision, recall)
    assert recall >= 0.92, (precision, recall)


def test_spice_default_extractor_is_parser(monkeypatch):
    """extract_tuples dispatches to the parser by default and to the
    chunker under CLIPCAP_SPICE_EXTRACTOR=chunker."""
    from clipcap_tpu.eval.spice import extract_tuples, extract_tuples_chunker
    from clipcap_tpu.eval.spice_parser import extract_tuples_parsed

    toks = "a bowl of soup on the counter".split()
    monkeypatch.delenv("CLIPCAP_SPICE_EXTRACTOR", raising=False)
    assert extract_tuples(toks) == extract_tuples_parsed(toks)
    monkeypatch.setenv("CLIPCAP_SPICE_EXTRACTOR", "chunker")
    assert extract_tuples(toks) == extract_tuples_chunker(toks)


def test_spice_extractor_coco5_chunker_baseline():
    """The chunker's measurement on this corpus, taken once at annotation
    time (before the parser existed) and pinned as a LOWER reference line:
    the parser-backed extractor must beat it.  Measured 2026-08-19:
    P=0.899 R=0.927 (see module docstring for the protocol)."""
    from clipcap_tpu.eval.spice import extract_tuples_chunker

    precision, recall, _ = _prf(COCO_VAL5_GOLD, extract_tuples_chunker)
    assert len(COCO_VAL5_GOLD) >= 30
    # Record-only floor: the chunker is frozen, these only catch accidental
    # edits to it or to the corpus.
    assert precision >= 0.87, (precision, recall)
    assert recall >= 0.90, (precision, recall)
