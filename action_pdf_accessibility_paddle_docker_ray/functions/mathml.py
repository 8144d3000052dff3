"""LaTeX → MathML conversion + <semantics>/<annotation> metadata wrapping.

Reference semantics:
- LaTeX→MathML via ``latex2mathml.converter.convert`` with all exceptions
  swallowed to ``""`` (/root/reference/src/ai.py:189-205).
- metadata annotation: parse MathML, wrap children in ``<semantics>``,
  append two ``<annotation encoding="text/plain">`` elements, idempotent and
  duplicate-checked (/root/reference/src/ai.py:207-263).

``latex2mathml`` is not installed in this sandbox; when absent we fall back
to a small deterministic converter covering the LaTeX grammar our synthetic
corpus generates (identifiers, numbers, + - = ( ), ``\\frac{}{}``, ``^{}``,
``_{}``, ``\\sqrt{}``, a few greek letters).  The fallback produces the
same *shape* of output (a namespaced ``<math>`` root with an ``<mrow>``)
so downstream wrapping behaves identically.
"""

from __future__ import annotations

from typing import Optional
from xml.etree import ElementTree as ET

try:  # pragma: no cover - exercised only where latex2mathml is installed
    import latex2mathml.converter as _l2m
except ImportError:
    _l2m = None

MATHML_NS = "http://www.w3.org/1998/Math/MathML"

_GREEK = {
    "alpha": "α", "beta": "β", "gamma": "γ", "delta": "δ",
    "epsilon": "ε", "theta": "θ", "lambda": "λ", "mu": "μ",
    "pi": "π", "sigma": "σ", "phi": "φ", "omega": "ω",
}


def _tokenize(latex: str) -> list[str]:
    tokens: list[str] = []
    i = 0
    while i < len(latex):
        ch = latex[i]
        if ch.isspace():
            i += 1
        elif ch == "\\":
            j = i + 1
            while j < len(latex) and latex[j].isalpha():
                j += 1
            if j == i + 1:
                raise ValueError(f"bad escape at {i}")
            tokens.append(latex[i:j])
            i = j
        elif ch.isdigit():
            j = i
            while j < len(latex) and (latex[j].isdigit() or latex[j] == "."):
                j += 1
            tokens.append(latex[i:j])
            i = j
        else:
            tokens.append(ch)
            i += 1
    return tokens


class _MiniParser:
    """Recursive-descent parser for the fallback grammar."""

    def __init__(self, tokens: list[str]):
        self.tokens = tokens
        self.pos = 0

    def peek(self) -> Optional[str]:
        return self.tokens[self.pos] if self.pos < len(self.tokens) else None

    def next(self) -> str:
        tok = self.tokens[self.pos]
        self.pos += 1
        return tok

    def expect(self, tok: str) -> None:
        if self.peek() != tok:
            raise ValueError(f"expected {tok!r} got {self.peek()!r}")
        self.next()

    def parse_group(self) -> list[ET.Element]:
        """``{ expr }`` → children."""
        self.expect("{")
        elems = self.parse_expr(stop={"}"})
        self.expect("}")
        return elems

    def parse_atom(self) -> list[ET.Element]:
        tok = self.peek()
        if tok is None:
            raise ValueError("unexpected end")
        if tok == "{":
            children = self.parse_group()
            row = ET.Element("mrow")
            row.extend(children)
            return [row]
        tok = self.next()
        if tok == "\\frac":
            num = self.parse_group()
            den = self.parse_group()
            frac = ET.Element("mfrac")
            frac.append(_as_single(num))
            frac.append(_as_single(den))
            return [frac]
        if tok == "\\sqrt":
            inner = self.parse_group()
            sq = ET.Element("msqrt")
            sq.extend(inner)
            return [sq]
        if tok.startswith("\\"):
            name = tok[1:]
            if name in _GREEK:
                mi = ET.Element("mi")
                mi.text = _GREEK[name]
                return [mi]
            raise ValueError(f"unsupported command {tok}")
        if tok[0].isdigit():
            mn = ET.Element("mn")
            mn.text = tok
            return [mn]
        if tok.isalpha():
            mi = ET.Element("mi")
            mi.text = tok
            return [mi]
        if tok in "+-=()[],.":
            mo = ET.Element("mo")
            mo.text = tok
            return [mo]
        raise ValueError(f"unsupported token {tok!r}")

    def parse_postfix(self) -> list[ET.Element]:
        base = self.parse_atom()
        while self.peek() in ("^", "_"):
            op = self.next()
            script = self.parse_atom() if self.peek() != "{" else [_as_single(self.parse_group())]
            el = ET.Element("msup" if op == "^" else "msub")
            el.append(_as_single(base))
            el.append(_as_single(script))
            base = [el]
        return base

    def parse_expr(self, stop: set | None = None) -> list[ET.Element]:
        stop = stop or set()
        out: list[ET.Element] = []
        while self.peek() is not None and self.peek() not in stop:
            out.extend(self.parse_postfix())
        return out


def _as_single(elems: list[ET.Element]) -> ET.Element:
    if len(elems) == 1:
        return elems[0]
    row = ET.Element("mrow")
    row.extend(elems)
    return row


def _mini_convert(latex: str) -> str:
    tokens = _tokenize(latex)
    parser = _MiniParser(tokens)
    children = parser.parse_expr()
    if parser.pos != len(tokens):
        raise ValueError("trailing tokens")
    math = ET.Element("math")
    math.set("xmlns", MATHML_NS)
    math.set("display", "inline")
    row = ET.Element("mrow")
    row.extend(children)
    math.append(row)
    return ET.tostring(math, encoding="unicode")


def latex_to_mathml(latex: str) -> str:
    """LaTeX → MathML; any conversion failure → '' (reference: ai.py:199-205)."""
    if _l2m is not None:  # pragma: no cover
        try:
            return _l2m.convert(latex)
        except Exception:
            return ""
    try:
        return _mini_convert(latex)
    except Exception:
        return ""


def add_mathml_metadata(mathml_str: str) -> str:
    """Wrap in <semantics> and append two plain-text annotations.

    Faithful reimplementation of /root/reference/src/ai.py:207-263 (same
    annotation texts, same idempotence checks, same pass-through on parse
    failure or non-<math> root).
    """
    try:
        root = ET.fromstring(mathml_str)
    except ET.ParseError:
        return mathml_str

    if root.tag != f"{{{MATHML_NS}}}math" and root.tag != "math":
        return mathml_str

    ns = {"m": MATHML_NS}
    ET.register_namespace("", MATHML_NS)

    existing = root.find("m:semantics", ns)
    if existing is not None:
        semantics = existing
    else:
        semantics = ET.Element(f"{{{MATHML_NS}}}semantics")
        for child in list(root):
            semantics.append(child)
            root.remove(child)
        root.append(semantics)

    texts = ("Generated by PaddleX AI", "Converted from LaTeX to MathML using latex2mathml")
    existing_texts = {a.text for a in semantics.findall("m:annotation", ns) if a.text}
    for text in texts:
        if text not in existing_texts:
            ann = ET.Element(f"{{{MATHML_NS}}}annotation")
            ann.text = text
            ann.set("encoding", "text/plain")
            semantics.append(ann)
    return ET.tostring(root, encoding="unicode")
