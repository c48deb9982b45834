"""Test-side reference implementation of gensim's wiki-markup filter.

The reference pipeline's cleaner IS gensim (``/root/reference/filters.py:55-58``
calls ``gensim.utils.decode_htmlentities`` and
``gensim.corpora.wikicorpus.remove_markup``). The gensim package is not
installed in this environment, so this module transcribes the relevant
functions from gensim's public source (gensim 4.3.x,
``gensim/corpora/wikicorpus.py`` and ``gensim/utils.py``) to serve as an
INDEPENDENT row-at-a-time oracle for the engine's native regexp chain
(``wiki_mysql_spark/functions/cleaning.py``). It is test-only code and is
never imported by the engine.

Transcription notes: logic and regexes are kept verbatim where Python allows;
only cosmetic renames (module-level docstrings, comments) differ.

License: the transcribed portions originate from gensim, which is released
under the GNU LGPL-2.1 (https://github.com/piskvorky/gensim — LGPL-2.1-only);
they are reproduced here solely as a test-side parity oracle and carry that
license. The engine itself neither imports nor derives from this module.
"""

from __future__ import annotations

import re
from html.entities import name2codepoint

# --- gensim/corpora/wikicorpus.py regexes (4.3.x) ---------------------------

RE_P0 = re.compile(r'<!--.*?-->', re.DOTALL | re.UNICODE)  # comments
RE_P1 = re.compile(r'<ref([> ].*?)(</ref>|/>)', re.DOTALL | re.UNICODE)  # footnotes
RE_P2 = re.compile(r'(\n\[\[[a-z][a-z][\w-]*:[^:\]]+\]\])+$', re.UNICODE)  # links to languages
RE_P5 = re.compile(r'\[(\w+):\/\/(.*?)(( (.*?))|())\]', re.UNICODE)  # remove URL, keep description
RE_P6 = re.compile(r'\[([^][]*)\|([^][]*)\]', re.DOTALL | re.UNICODE)  # simplify links, keep description
RE_P9 = re.compile(r'<nowiki([> ].*?)(</nowiki>|/>)', re.DOTALL | re.UNICODE)  # outside links
RE_P10 = re.compile(r'<math([> ].*?)(</math>|/>)', re.DOTALL | re.UNICODE)  # math content
RE_P11 = re.compile(r'<(.*?)>', re.DOTALL | re.UNICODE)  # all other tags
RE_P12 = re.compile(r'(({\|)|(\|-(?!\d))|(\|}))(.*?)(?=\n)', re.UNICODE)  # table formatting
RE_P13 = re.compile(
    r'(?<=(\n[ ])|(\n\n)|([ ]{2})|(.\n)|(.\t))(\||\!)([^[\]\n]*?\|)*', re.UNICODE
)  # table cell formatting
RE_P14 = re.compile(r'\[\[Category:[^][]*\]\]', re.UNICODE)  # categories
RE_P15 = re.compile(r'\[\[([fF]ile:|[iI]mage)[^]]*(\]\])', re.UNICODE)  # file/image templates
RE_P17 = re.compile(
    r'(\n.{0,4}((bgcolor)|(\d{0,1}[ ]?colspan)|(rowspan)|(style=)|(class=)|(align=)|(scope=))(.*))|'
    r'(^.{0,4}((bgcolor)|(\d{0,1}[ ]?colspan)|(rowspan)|(style=)|(class=)|(align=)|(scope=))(.*))',
    re.UNICODE,
)  # table distinct cell formatting


def remove_template(s: str) -> str:
    """Remove {{template}} blocks with full brace nesting (gensim's
    character-scan version — not expressible as a single regex)."""
    n_open, n_close = 0, 0
    starts, ends = [], [-1]
    in_template = False
    prev_c = None
    for i, c in enumerate(s):
        if not in_template:
            if c == '{' and c == prev_c:
                starts.append(i - 1)
                in_template = True
                n_open = 2
        else:
            if c == '{':
                n_open += 1
            elif c == '}':
                n_close += 1
            if n_open == n_close:
                ends.append(i)
                in_template = False
                n_open, n_close = 0, 0
        prev_c = c
    starts.append(None)
    return ''.join(s[end + 1:start] for end, start in zip(ends, starts))


def remove_file(s: str) -> str:
    return re.sub(RE_P15, '', s)


def remove_markup(text: str, promote_remaining: bool = True, simplify_links: bool = True) -> str:
    text = re.sub(RE_P2, '', text)  # remove the last list (=languages)
    # markup is recursive; strip innermost-out in a bounded loop
    text = remove_template(text)
    text = remove_file(text)
    iters = 0
    while True:
        old, iters = text, iters + 1
        text = re.sub(RE_P0, '', text)  # remove comments
        text = re.sub(RE_P1, '', text)  # remove footnotes
        text = re.sub(RE_P9, '', text)  # remove outside links
        text = re.sub(RE_P10, '', text)  # remove math content
        text = re.sub(RE_P11, '', text)  # remove all remaining tags
        text = re.sub(RE_P14, '', text)  # remove categories
        text = re.sub(RE_P5, '\\3', text)  # remove urls, keep description
        if simplify_links:
            text = re.sub(RE_P6, '\\2', text)  # simplify links, keep description
        # remove table markup
        text = text.replace("!!", "\n|")  # each table head cell on a separate line
        text = text.replace("|-||", "\n|")  # for cases where a cell is filled with '-'
        text = re.sub(RE_P12, '\n', text)  # remove formatting lines
        text = text.replace('|||', '|\n|')  # each table cell on a separate line
        text = text.replace('||', '\n|')  # each table cell on a separate line
        text = re.sub(RE_P13, '\n', text)  # leave only cell content
        text = re.sub(RE_P17, '\n', text)  # remove formatting lines
        # remove empty mark-up
        text = text.replace('[]', '')
        # stop if nothing changed between two iterations or after a fixed number of iterations
        if old == text or iters > 2:
            break
    if promote_remaining:
        text = text.replace('[', '').replace(']', '')  # promote all remaining markup to plain text
    return text


# --- gensim/utils.py decode_htmlentities (4.3.x) ----------------------------

RE_HTML_ENTITY = re.compile(r'&(#?)([xX]?)(\w{1,8});', re.UNICODE)


def _safe_unichr(intval: int) -> str:
    try:
        return chr(intval)
    except ValueError:
        # a narrow-build workaround in gensim; surrogate-pair it
        s = "\\U%08x" % intval
        return s.encode('utf-8').decode('unicode-escape')


def decode_htmlentities(text: str) -> str:
    def substitute_entity(match):
        try:
            ent = match.group(3)
            if match.group(1) == '#':
                if match.group(2) == '':
                    return _safe_unichr(int(ent))
                elif match.group(2) in ['x', 'X']:
                    return _safe_unichr(int(ent, 16))
            else:
                cp = name2codepoint.get(ent)
                if cp:
                    return _safe_unichr(cp)
                else:
                    return match.group()
        except Exception:
            return match.group()

    return RE_HTML_ENTITY.sub(substitute_entity, text)


# --- the reference's full WikiBodyFilter (filters.py:52-64) -----------------


def wiki_body_filter(
    text: str,
    remove_html: bool = True,
    valid_ranges: tuple[tuple[int, int], ...] = (),
    invalid_ranges: tuple[tuple[int, int], ...] = (),
) -> str:
    """The reference's __call__ chain: entity decode -> remove_markup ->
    unicode white/blacklist -> whitespace collapse (keep first char)."""
    if remove_html:
        text = decode_htmlentities(text)
    text = remove_markup(text)
    if valid_ranges:
        cls = "".join(f"{chr(s)}-{chr(e)}" for s, e in valid_ranges)
        text = re.sub(f"[^{cls}]", "", text)
    if invalid_ranges:
        cls = "".join(f"{chr(s)}-{chr(e)}" for s, e in invalid_ranges)
        text = re.sub(f"[{cls}]", "", text)
    text = re.sub(r"(\s)\s*", r"\g<1>", text)
    return text
