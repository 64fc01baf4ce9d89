"""Fourth SPICE gold corpus — captions VERBATIM from the COCO captions
dataset (VERDICT r3 next-round #3b).

The three earlier corpora (tests/test_eval.py) were *composed* by the
annotator; this one takes its captions verbatim from COCO val2014
annotation sets (transcribed from the dataset; each group below is one
image's caption set), so the text distribution is the real eval workload:
ungrammatical fragments, odd compounds ("boat themed bathroom"),
misattached PPs, control verbs ("preparing to blow out").

Annotation discipline (same as the r3 corpora, see
test_spice_extractor_heldout_accuracy): gold graphs were hand-derived per
Anderson et al. 2016 semantics BEFORE the extractor was run on any of
these captions, and are not edited to fit extractor behavior.  Conventions
follow the earlier corpora: objects = head nouns as written; compound-noun
modifiers and adjectives = attributes; prepositions (incl. multiword) =
relations; verb relations absorb their preposition; of-NPs chain
(``("wheel", "of", "bicycle")``); possessive pronouns are NOT resolved;
both sides Porter-stemmed for comparison.

First measurement (2026-08-19, annotate-before-run): **P=0.863 R=0.901**
over 26 captions — the honest held-out number for real COCO text, vs
~0.99 on the composed corpora.  Ten captions diverged: phrasal-verb
particles ("blowing OUT the candle" left ``("out",)`` tuples), postposed
adjectives ("a young boy barefoot" parsed barefoot as the head noun),
verbs unrecognized after a subject NP ("girl inhales"), PP attachment
across a copula ("a man in a red hat is ON A MOTORCYCLE" attached to
hat), of-chain attachment ("appearance of the wheel OF A BICYCLE"
attached to appearance), passive predicates in relative clauses ("walls
that are painted baby blue"), -ly adverbs kept as attributes ("partly
cloudy"), and two genuine attachment ambiguities annotated semantically
("man with a helmet on a moped", "holding an umbrella next to a herd").
Any later extractor extension must leave these annotations untouched;
the pre-extension numbers above are the held-out measurement of record.

Round-4 extractor extensions driven by these failures (phrasal particles,
infinitive base verbs + control-verb 2-tuples, copula-aware subject
lifting, passive-resultative predicates, -ly adverb filtering, postposed
predicative adjectives) raised the corpus to P=0.984 R=0.989 with the
annotations UNCHANGED; the three residual divergences are the two
attachment ambiguities plus ("walls", "baby") from the "baby blue"
compound color.  Floors pinned at 0.95 like the composed corpora.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Each entry: (verbatim caption, gold tuple set).  Groups of captions from
# the same image are kept adjacent; tests/test_jvm_parity.py reuses these
# groups as (refs, hypothesis) corpora for the Java-SPICE comparison.
COCO_VAL_GOLD = [
    # --- COCO_val2014 bike-with-clock image -------------------------------
    ("A bicycle replica with a clock as the front wheel.",
     {("replica",), ("replica", "bicycle"), ("clock",), ("wheel",),
      ("wheel", "front"), ("replica", "with", "clock"),
      ("clock", "as", "wheel")}),
    ("The bike has a clock as a tire.",
     {("bike",), ("clock",), ("tire",), ("bike", "has", "clock"),
      ("clock", "as", "tire")}),
    ("A black metal bicycle with a clock inside the front wheel.",
     {("bicycle",), ("bicycle", "black"), ("bicycle", "metal"), ("clock",),
      ("wheel",), ("wheel", "front"), ("bicycle", "with", "clock"),
      ("clock", "inside", "wheel")}),
    ("A clock with the appearance of the wheel of a bicycle",
     {("clock",), ("appearance",), ("wheel",), ("bicycle",),
      ("clock", "with", "appearance"), ("appearance", "of", "wheel"),
      ("wheel", "of", "bicycle")}),
    # --- Honda motorcycle image -------------------------------------------
    ("A black Honda motorcycle parked in front of a garage.",
     {("motorcycle",), ("motorcycle", "black"), ("motorcycle", "honda"),
      ("garage",), ("motorcycle", "parked", "garage")}),
    ("A Honda motorcycle parked in a grass driveway",
     {("motorcycle",), ("motorcycle", "honda"), ("driveway",),
      ("driveway", "grass"), ("motorcycle", "parked", "driveway")}),
    ("A black Honda motorcycle with a dark burgundy seat.",
     {("motorcycle",), ("motorcycle", "black"), ("motorcycle", "honda"),
      ("seat",), ("seat", "dark"), ("seat", "burgundy"),
      ("motorcycle", "with", "seat")}),
    # --- blue bathroom image ----------------------------------------------
    ("A room with blue walls and a white sink and door.",
     {("room",), ("walls",), ("walls", "blue"), ("sink",),
      ("sink", "white"), ("door",), ("room", "with", "walls"),
      ("room", "with", "sink"), ("room", "with", "door")}),
    ("Blue and white color scheme in a small bathroom.",
     {("scheme",), ("scheme", "color"), ("scheme", "blue"),
      ("scheme", "white"), ("bathroom",), ("bathroom", "small"),
      ("scheme", "in", "bathroom")}),
    ("A blue boat themed bathroom with a life preserver on the wall",
     {("bathroom",), ("bathroom", "blue"), ("bathroom", "boat"),
      ("bathroom", "themed"), ("preserver",), ("preserver", "life"),
      ("wall",), ("bathroom", "with", "preserver"),
      ("preserver", "on", "wall")}),
    ("A bathroom with walls that are painted baby blue.",
     {("bathroom",), ("walls",), ("bathroom", "with", "walls"),
      ("walls", "painted"), ("walls", "blue")}),
    # --- man on moped image -----------------------------------------------
    ("A man with a red helmet on a small moped on a dirt road.",
     {("man",), ("helmet",), ("helmet", "red"), ("moped",),
      ("moped", "small"), ("road",), ("road", "dirt"),
      ("man", "with", "helmet"), ("man", "on", "moped"),
      ("moped", "on", "road")}),
    ("Man riding a motor bike on a dirt road on the countryside.",
     {("man",), ("bike",), ("bike", "motor"), ("road",), ("road", "dirt"),
      ("countryside",), ("man", "riding", "bike"), ("bike", "on", "road"),
      ("road", "on", "countryside")}),
    ("A man riding on the back of a motorcycle.",
     {("man",), ("back",), ("motorcycle",), ("man", "riding", "back"),
      ("back", "of", "motorcycle")}),
    ("A man in a red shirt and a red hat is on a motorcycle on a hill side.",
     {("man",), ("shirt",), ("shirt", "red"), ("hat",), ("hat", "red"),
      ("motorcycle",), ("side",), ("side", "hill"),
      ("man", "in", "shirt"), ("man", "in", "hat"),
      ("man", "on", "motorcycle"), ("motorcycle", "on", "side")}),
    # --- girl blowing out candle image -------------------------------------
    ("A young girl inhales with the intent of blowing out a candle.",
     {("girl",), ("girl", "young"), ("intent",), ("candle",),
      ("girl", "inhales", "intent"), ("girl", "blowing", "candle")}),
    ("A young girl is preparing to blow out her candle.",
     {("girl",), ("girl", "young"), ("candle",), ("girl", "preparing"),
      ("girl", "blow", "candle")}),
    ("Girl blowing out the candle on an ice-cream",
     {("girl",), ("candle",), ("ice-cream",),
      ("girl", "blowing", "candle"), ("candle", "on", "ice-cream")}),
    # --- woman cutting cake image ------------------------------------------
    ("A woman wearing a net on her head cutting a cake.",
     {("woman",), ("net",), ("head",), ("cake",),
      ("woman", "wearing", "net"), ("net", "on", "head"),
      ("woman", "cutting", "cake")}),
    ("A woman cutting a large white sheet cake.",
     {("woman",), ("cake",), ("cake", "large"), ("cake", "white"),
      ("cake", "sheet"), ("woman", "cutting", "cake")}),
    ("A woman wearing a hair net cutting a large sheet cake.",
     {("woman",), ("net",), ("net", "hair"), ("cake",), ("cake", "large"),
      ("cake", "sheet"), ("woman", "wearing", "net"),
      ("woman", "cutting", "cake")}),
    # --- child with umbrella / yak image ------------------------------------
    ("A child holding a flowered umbrella and petting a yak.",
     {("child",), ("umbrella",), ("umbrella", "flowered"), ("yak",),
      ("child", "holding", "umbrella"), ("child", "petting", "yak")}),
    ("A young man holding an umbrella next to a herd of cattle.",
     {("man",), ("man", "young"), ("umbrella",), ("herd",), ("cattle",),
      ("man", "holding", "umbrella"), ("man", "next to", "herd"),
      ("herd", "of", "cattle")}),
    ("a young boy barefoot holding an umbrella touching the horn of a cow",
     {("boy",), ("boy", "young"), ("boy", "barefoot"), ("umbrella",),
      ("horn",), ("cow",), ("boy", "holding", "umbrella"),
      ("boy", "touching", "horn"), ("horn", "of", "cow")}),
    # --- singletons ----------------------------------------------------------
    ("There is a GOL plane taking off in a partly cloudy sky.",
     {("plane",), ("plane", "gol"), ("sky",), ("sky", "cloudy"),
      ("plane", "taking", "sky")}),
    ("A giraffe eating food from the top of the tree.",
     {("giraffe",), ("food",), ("top",), ("tree",),
      ("giraffe", "eating", "food"), ("food", "from", "top"),
      ("top", "of", "tree")}),
]


def _prf(gold):
    from clipcap_tpu.eval.porter import porter_stem
    from clipcap_tpu.eval.spice import extract_tuples
    from clipcap_tpu.eval.tokenization import ptb_tokenize_line

    def stem_set(ts):
        return {tuple(porter_stem(w) for w in t) for t in ts}

    tp = fp = fn = 0
    misses = []
    for caption, want in gold:
        got_s = stem_set(extract_tuples(ptb_tokenize_line(caption)))
        want_s = stem_set(want)
        tp += len(got_s & want_s)
        fp += len(got_s - want_s)
        fn += len(want_s - got_s)
        if got_s != want_s:
            misses.append((caption, sorted(want_s - got_s),
                           sorted(got_s - want_s)))
    return tp / max(1, tp + fp), tp / max(1, tp + fn), misses


def test_spice_extractor_coco_val_accuracy():
    """Held-out floor on verbatim COCO text — see module docstring for the
    annotate-before-run measurement of record (P=0.863 R=0.901) and the
    post-extension level (P=0.984 R=0.989)."""
    precision, recall, misses = _prf(COCO_VAL_GOLD)
    assert len(COCO_VAL_GOLD) >= 25
    detail = "\n".join(f"{c!r}: -{m} +{e}" for c, m, e in misses[:8])
    assert precision >= 0.95, (precision, recall, detail)
    assert recall >= 0.95, (precision, recall, detail)
