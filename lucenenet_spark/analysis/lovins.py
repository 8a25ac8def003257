"""Lovins (1968) stemmer — implemented from the published algorithm
(J.B. Lovins, "Development of a stemming algorithm", Mechanical
Translation and Computational Linguistics 11, 1968; the snowballstem.org
lovins page carries the same tables; public domain).  Fills the
reference's SnowballFilter(name="Lovins") role
(``Tartarus/Snowball/Ext/LovinsStemmer.cs``); validated against the
full published test vocabulary during development.

Three independent passes: (1) remove the longest of 294 endings whose
letter-condition accepts the remaining stem — a failed condition
falls back to the next-shorter matching ending; (2) undouble a final
double consonant; (3) one respell (recode) rule.
"""

from __future__ import annotations

_ENDINGS = {
    "s'": 'A',
    'a': 'A',
    'ia': 'A',
    'ata': 'A',
    'ic': 'A',
    'aic': 'A',
    'allic': 'BB',
    'aric': 'A',
    'atic': 'B',
    'itic': 'H',
    'antic': 'C',
    'istic': 'A',
    'alistic': 'B',
    'aristic': 'A',
    'ivistic': 'A',
    'ed': 'E',
    'anced': 'B',
    'enced': 'A',
    'ished': 'A',
    'ied': 'A',
    'ened': 'E',
    'ioned': 'A',
    'ated': 'I',
    'ented': 'C',
    'ized': 'F',
    'arized': 'A',
    'oid': 'A',
    'aroid': 'A',
    'hood': 'A',
    'ehood': 'A',
    'ihood': 'A',
    'elihood': 'E',
    'ward': 'A',
    'e': 'A',
    'ae': 'A',
    'ance': 'B',
    'icance': 'A',
    'ence': 'A',
    'ide': 'L',
    'icide': 'A',
    'otide': 'A',
    'age': 'B',
    'able': 'A',
    'atable': 'A',
    'izable': 'E',
    'arizable': 'A',
    'ible': 'A',
    'encible': 'A',
    'ene': 'E',
    'ine': 'M',
    'idine': 'I',
    'one': 'R',
    'ature': 'E',
    'eature': 'Z',
    'ese': 'A',
    'wise': 'A',
    'ate': 'A',
    'entiate': 'A',
    'inate': 'A',
    'ionate': 'D',
    'ite': 'AA',
    'ive': 'A',
    'ative': 'A',
    'ize': 'F',
    'alize': 'A',
    'icalize': 'A',
    'ialize': 'A',
    'entialize': 'A',
    'ionalize': 'A',
    'arize': 'A',
    'ing': 'N',
    'ancing': 'B',
    'encing': 'A',
    'aging': 'B',
    'ening': 'E',
    'ioning': 'A',
    'ating': 'I',
    'enting': 'C',
    'ying': 'B',
    'izing': 'F',
    'arizing': 'A',
    'ish': 'C',
    'yish': 'A',
    'i': 'A',
    'al': 'BB',
    'ical': 'A',
    'aical': 'A',
    'istical': 'A',
    'oidal': 'A',
    'eal': 'Y',
    'ial': 'A',
    'ancial': 'A',
    'arial': 'A',
    'ential': 'A',
    'ional': 'A',
    'ational': 'B',
    'izational': 'A',
    'ental': 'A',
    'ful': 'A',
    'eful': 'A',
    'iful': 'A',
    'yl': 'R',
    'ism': 'B',
    'icism': 'A',
    'oidism': 'A',
    'alism': 'B',
    'icalism': 'A',
    'ionalism': 'A',
    'inism': 'J',
    'ativism': 'A',
    'um': 'U',
    'ium': 'A',
    'ian': 'A',
    'ician': 'A',
    'en': 'F',
    'ogen': 'A',
    'on': 'S',
    'ion': 'Q',
    'ation': 'B',
    'ication': 'G',
    'entiation': 'A',
    'ination': 'A',
    'isation': 'A',
    'arisation': 'A',
    'entation': 'A',
    'ization': 'F',
    'arization': 'A',
    'action': 'G',
    'o': 'A',
    'ar': 'X',
    'ear': 'Y',
    'ier': 'A',
    'ariser': 'A',
    'izer': 'F',
    'arizer': 'A',
    'or': 'T',
    'ator': 'A',
    's': 'W',
    "'s": 'A',
    'as': 'B',
    'ics': 'A',
    'istics': 'A',
    'es': 'E',
    'ances': 'B',
    'ences': 'A',
    'ides': 'L',
    'oides': 'A',
    'ages': 'B',
    'ies': 'P',
    'acies': 'A',
    'ancies': 'A',
    'encies': 'A',
    'aries': 'A',
    'ities': 'A',
    'alities': 'A',
    'ivities': 'A',
    'ines': 'M',
    'nesses': 'A',
    'ates': 'A',
    'atives': 'A',
    'ings': 'N',
    'is': 'A',
    'als': 'BB',
    'ials': 'A',
    'entials': 'A',
    'ionals': 'A',
    'isms': 'B',
    'ians': 'A',
    'icians': 'A',
    'ions': 'B',
    'ations': 'B',
    'arisations': 'A',
    'entations': 'A',
    'izations': 'A',
    'arizations': 'A',
    'ars': 'O',
    'iers': 'A',
    'izers': 'F',
    'ators': 'A',
    'less': 'A',
    'eless': 'A',
    'ness': 'A',
    'eness': 'E',
    'ableness': 'A',
    'eableness': 'E',
    'ibleness': 'A',
    'ateness': 'A',
    'iteness': 'A',
    'iveness': 'A',
    'ativeness': 'A',
    'ingness': 'A',
    'ishness': 'A',
    'iness': 'A',
    'ariness': 'E',
    'alness': 'A',
    'icalness': 'A',
    'antialness': 'A',
    'entialness': 'A',
    'ionalness': 'A',
    'fulness': 'A',
    'lessness': 'A',
    'ousness': 'A',
    'eousness': 'A',
    'iousness': 'A',
    'itousness': 'A',
    'entness': 'A',
    'ants': 'B',
    'ists': 'A',
    'icists': 'A',
    'us': 'V',
    'ous': 'A',
    'eous': 'A',
    'aceous': 'A',
    'antaneous': 'A',
    'ious': 'A',
    'acious': 'B',
    'itous': 'A',
    'ant': 'B',
    'icant': 'A',
    'ent': 'C',
    'ement': 'A',
    'izement': 'A',
    'ist': 'A',
    'icist': 'A',
    'alist': 'A',
    'icalist': 'A',
    'ialist': 'A',
    'ionist': 'A',
    'entist': 'A',
    'y': 'B',
    'acy': 'A',
    'ancy': 'B',
    'ency': 'A',
    'ly': 'B',
    'ealy': 'Y',
    'ably': 'A',
    'ibly': 'A',
    'edly': 'E',
    'iedly': 'A',
    'ely': 'E',
    'ately': 'A',
    'ively': 'A',
    'atively': 'A',
    'ingly': 'B',
    'atingly': 'A',
    'ily': 'A',
    'lily': 'A',
    'arily': 'A',
    'ally': 'B',
    'ically': 'A',
    'aically': 'A',
    'allically': 'C',
    'istically': 'A',
    'alistically': 'B',
    'oidally': 'A',
    'ially': 'A',
    'entially': 'A',
    'ionally': 'A',
    'ationally': 'B',
    'izationally': 'B',
    'entally': 'A',
    'fully': 'A',
    'efully': 'A',
    'ifully': 'A',
    'enly': 'E',
    'arly': 'K',
    'early': 'Y',
    'lessly': 'A',
    'ously': 'A',
    'eously': 'A',
    'iously': 'A',
    'ently': 'A',
    'ary': 'F',
    'ery': 'E',
    'icianry': 'A',
    'atory': 'A',
    'ity': 'A',
    'acity': 'A',
    'icity': 'A',
    'eity': 'A',
    'ality': 'A',
    'icality': 'A',
    'iality': 'A',
    'antiality': 'A',
    'entiality': 'A',
    'ionality': 'A',
    'elity': 'A',
    'ability': 'A',
    'izability': 'A',
    'arizability': 'A',
    'ibility': 'A',
    'inity': 'CC',
    'arity': 'B',
    'ivity': 'A',
}

_DOUBLES = ("bb", "dd", "gg", "ll", "mm", "nn", "pp", "rr", "ss", "tt")
_AA_SET = ("d", "f", "ph", "th", "l", "er", "or", "es", "t")

# respell rules: suffix -> (replacement, forbidden preceding chars)
_RESPELL = [
    ("istr", "ister", ""), ("metr", "meter", ""),
    ("uad", "uas", ""), ("vad", "vas", ""), ("cid", "cis", ""),
    ("lid", "lis", ""), ("erid", "eris", ""), ("pand", "pans", ""),
    ("end", "ens", "s"), ("ond", "ons", ""), ("lud", "lus", ""),
    ("rud", "rus", ""), ("ul", "l", "aio"), ("her", "hes", "pt"),
    ("urs", "ur", ""), ("uct", "uc", ""), ("et", "es", "n"),
    ("mit", "mis", ""), ("ent", "ens", "m"), ("umpt", "um", ""),
    ("rpt", "rb", ""), ("ert", "ers", ""), ("yt", "ys", ""),
    ("iev", "ief", ""), ("olv", "olut", ""), ("ax", "ac", ""),
    ("ex", "ec", ""), ("bex", "bic", ""), ("dex", "dic", ""),
    ("pex", "pic", ""), ("tex", "tic", ""), ("ix", "ic", ""),
    ("lux", "luc", ""), ("yz", "ys", ""),
]


def _cond(letter: str, stem: str) -> bool:
    n = len(stem)
    if letter == "A":
        return n >= 2
    if letter == "B":
        return n >= 3
    if letter == "C":
        return n >= 4
    if letter == "D":
        return n >= 5
    if letter == "E":
        return n >= 2 and stem[-1] != "e"
    if letter == "F":
        return n >= 3 and stem[-1] != "e"
    if letter == "G":
        return n >= 3 and stem[-1] == "f"
    if letter == "H":
        return n >= 2 and (stem[-1] == "t" or stem.endswith("ll"))
    if letter == "I":
        return n >= 2 and stem[-1] not in "oe"
    if letter == "J":
        return n >= 2 and stem[-1] not in "ae"
    if letter == "K":
        return n >= 3 and (
            stem[-1] in "li" or (stem[-1] == "e" and stem[-3] == "u")
        )
    if letter == "L":
        if n < 2 or stem[-1] in "ux":
            return False
        return stem[-1] != "s" or stem[-2] == "o"
    if letter == "M":
        return n >= 2 and stem[-1] not in "acem"
    if letter == "N":
        return n >= 3 and (stem[-3] != "s" or n >= 4)
    if letter == "O":
        return n >= 2 and stem[-1] in "li"
    if letter == "P":
        return n >= 2 and stem[-1] != "c"
    if letter == "Q":
        return n >= 3 and stem[-1] not in "ln"
    if letter == "R":
        return n >= 2 and stem[-1] in "nr"
    if letter == "S":
        return n >= 2 and (
            stem.endswith("dr")
            or (stem[-1] == "t" and not stem.endswith("tt"))
        )
    if letter == "T":
        return n >= 2 and (
            stem[-1] == "s" or (stem[-1] == "t" and stem[-2] != "o")
        )
    if letter == "U":
        return n >= 2 and stem[-1] in "lmnr"
    if letter == "V":
        return n >= 2 and stem[-1] == "c"
    if letter == "W":
        return n >= 2 and stem[-1] not in "su"
    if letter == "X":
        return n >= 2 and (
            stem[-1] in "li"
            or (stem[-1] == "e" and n >= 3 and stem[-3] == "u")
        )
    if letter == "Y":
        return n >= 2 and stem.endswith("in")
    if letter == "Z":
        return n >= 2 and stem[-1] != "f"
    if letter == "AA":
        return n >= 2 and stem.endswith(_AA_SET)
    if letter == "BB":
        return n >= 3 and not stem.endswith("met") and not stem.endswith("ryst")
    if letter == "CC":
        return n >= 2 and stem[-1] == "l"
    raise ValueError(letter)


def lovins_stem(word: str) -> str:
    if not word:
        return word
    # pass 1: longest ending whose condition accepts the stem;
    # condition failure backtracks to the next-shorter matching ending
    matches = sorted(
        (e for e in _ENDINGS if word.endswith(e)), key=len, reverse=True
    )
    for e in matches:
        stem = word[: -len(e)]
        if _cond(_ENDINGS[e], stem):
            word = stem
            break
    # pass 2: undouble
    if word.endswith(_DOUBLES):
        word = word[:-1]
    # pass 3: respell (longest match, with forbidden-preceding checks)
    best = None
    for suf, rep, forbid in _RESPELL:
        if word.endswith(suf) and (best is None or len(suf) > len(best[0])):
            best = (suf, rep, forbid)
    if best is not None:
        suf, rep, forbid = best
        pos = len(word) - len(suf)
        if not forbid or pos < 1 or word[pos - 1] not in forbid:
            word = word[:pos] + rep
    return word
