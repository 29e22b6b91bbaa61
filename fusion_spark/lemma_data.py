"""Curated English irregular-form lemma table — the LARGER fixture for the
``reference_lemma_table`` tokenizer mode (P5 plug-point; the small inline
``LEMMA_TABLE_EN_SAMPLE`` in tokenize.py stays the default so existing
gate/test behavior is unchanged).

Scope rule (same as the sample): only lemmas a CONTEXT-FREE lookup can
state — irregular verb forms, irregular plurals, suppletive comparatives
whose lemma is unambiguous. POS-ambiguous surfaces are deliberately
ABSENT: "better" (good/well), "left" (leave/left), "lay" (lie/lay),
"found" (find/found-a-company)… a token table cannot disambiguate them;
the reference's spaCy model (src/data/preprocessor.py:69-72) can, and that
is precisely the residual parity delta this plug-point documents.
("found"→find IS in the small sample table for test continuity; this
curated set drops it under the scope rule — regenerate from spaCy via
tools/make_lemma_table.py for corpus-faithful behavior.)

Everything here is standard public English morphology (any dictionary's
irregular-forms appendix). Production tables are regenerated from public
spaCy output with tools/make_lemma_table.py.
"""

from __future__ import annotations

LEMMA_TABLE_EN_IRREGULARS: dict[str, str] = {
    # --- be / auxiliaries ---
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "being": "be",
    "has": "have", "had": "have", "having": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    # --- irregular verbs: past / participle forms with one lemma ---
    "arose": "arise", "arisen": "arise",
    "ate": "eat", "eaten": "eat",
    "became": "become",
    "began": "begin", "begun": "begin",
    "bent": "bend",
    "bit": "bite", "bitten": "bite",
    "blew": "blow", "blown": "blow",
    "broke": "break", "broken": "break",
    "brought": "bring",
    "built": "build",
    "bought": "buy",
    "caught": "catch",
    "chose": "choose", "chosen": "choose",
    "came": "come", "coming": "come",
    "crept": "creep",
    "dealt": "deal",
    "drank": "drink", "drunk": "drink",
    "drew": "draw", "drawn": "draw",
    "drove": "drive", "driven": "drive",
    "fell": "fall", "fallen": "fall",
    "fed": "feed",
    "felt": "feel",
    "fought": "fight",
    "flew": "fly", "flown": "fly",
    "forbade": "forbid", "forbidden": "forbid",
    "forgot": "forget", "forgotten": "forget",
    "forgave": "forgive", "forgiven": "forgive",
    "froze": "freeze", "frozen": "freeze",
    "gave": "give", "given": "give", "giving": "give",
    "went": "go", "gone": "go", "going": "go",
    "grew": "grow", "grown": "grow",
    "hid": "hide", "hidden": "hide",
    "held": "hold",
    "kept": "keep",
    "knew": "know", "known": "know",
    "laid": "lay",
    "led": "lead",
    "lent": "lend",
    "lost": "lose",
    "made": "make", "making": "make",
    "meant": "mean",
    "met": "meet",
    "paid": "pay",
    "rode": "ride", "ridden": "ride",
    "rang": "ring", "rung": "ring",
    "rose": "rise", "risen": "rise",
    "ran": "run", "running": "run",
    "said": "say", "says": "say",
    "sold": "sell",
    "sent": "send",
    "shook": "shake", "shaken": "shake",
    "shone": "shine",
    "shot": "shoot",
    "sang": "sing", "sung": "sing",
    "sank": "sink", "sunk": "sink",
    "sat": "sit",
    "slept": "sleep",
    "spoke": "speak", "spoken": "speak",
    "spent": "spend",
    "stood": "stand",
    "stole": "steal", "stolen": "steal",
    "stuck": "stick",
    "stung": "sting",
    "swam": "swim", "swum": "swim",
    "swore": "swear", "sworn": "swear",
    "took": "take", "taken": "take", "taking": "take",
    "taught": "teach",
    "tore": "tear", "torn": "tear",
    "told": "tell",
    "thought": "think",
    "threw": "throw", "thrown": "throw",
    "understood": "understand",
    "woke": "wake", "woken": "wake",
    "wore": "wear", "worn": "wear",
    "wove": "weave", "woven": "weave",
    "won": "win",
    "wound": "wind",
    "withdrew": "withdraw", "withdrawn": "withdraw",
    "wrote": "write", "written": "write", "writing": "write",
    "saw": "see", "seen": "see",
    "got": "get", "gotten": "get",
    # --- irregular plurals ---
    "mice": "mouse", "geese": "goose", "feet": "foot", "teeth": "tooth",
    "children": "child", "men": "man", "women": "woman",
    "people": "person",
    "oxen": "ox", "lice": "louse",
    "cacti": "cactus", "fungi": "fungus", "nuclei": "nucleus",
    "radii": "radius", "stimuli": "stimulus", "alumni": "alumnus",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "appendices": "appendix",
    "analyses": "analysis", "bases": "basis", "crises": "crisis",
    "diagnoses": "diagnosis", "hypotheses": "hypothesis",
    "parentheses": "parenthesis", "syntheses": "synthesis",
    "theses": "thesis",
    "criteria": "criterion", "phenomena": "phenomenon",
    "data": "datum", "media": "medium", "strata": "stratum",
    "curricula": "curriculum", "memoranda": "memorandum",
    "wolves": "wolf", "knives": "knife", "lives": "life",
    "leaves": "leaf", "loaves": "loaf", "halves": "half",
    "shelves": "shelf", "thieves": "thief", "wives": "wife",
    "selves": "self", "calves": "calf",
    # --- suppletive comparatives with one lemma ---
    "worse": "bad", "worst": "bad",
    "further": "far", "furthest": "far", "farther": "far", "farthest": "far",
    "least": "little",
    "eldest": "old", "elder": "old",
}
