"""Language detection + multilingual embedding hooks.

Parity with the reference language module (reference language.py:34-225):
50-language support list, minimum-confidence detection, Unicode-range
script detection, batch detection, and a multilingual encoder hook
(paraphrase-multilingual-MiniLM-L12-v2 when real weights exist).

First-party detector (the reference wraps `langdetect`, absent here):
script detection by Unicode block ranges (reference language.py:140-168
does the same), then for Latin-script text an n-gram/stopword profile
scorer over the most common function words of 12 major Latin-script
languages. langdetect is used transparently when importable.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

try:  # optional dependency convention (reference language.py:10-15)
    import langdetect  # type: ignore

    LANGDETECT_AVAILABLE = True
except ImportError:
    LANGDETECT_AVAILABLE = False

SUPPORTED_LANGUAGES = [
    "af", "ar", "bg", "bn", "ca", "cs", "cy", "da", "de", "el", "en", "es",
    "et", "fa", "fi", "fr", "gu", "he", "hi", "hr", "hu", "id", "it", "ja",
    "kn", "ko", "lt", "lv", "mk", "ml", "mr", "ne", "nl", "no", "pa", "pl",
    "pt", "ro", "ru", "sk", "sl", "so", "sq", "sv", "sw", "ta", "te", "th",
    "tl", "tr", "uk", "ur", "vi", "zh",
]  # 50+ language codes (reference language.py:34-40)

_SCRIPT_RANGES: List[Tuple[int, int, str]] = [
    (0x0400, 0x04FF, "cyrillic"),
    (0x0590, 0x05FF, "hebrew"),
    (0x0600, 0x06FF, "arabic"),
    (0x0900, 0x097F, "devanagari"),
    (0x0980, 0x09FF, "bengali"),
    (0x0E00, 0x0E7F, "thai"),
    (0x1100, 0x11FF, "hangul"),
    (0x3040, 0x309F, "hiragana"),
    (0x30A0, 0x30FF, "katakana"),
    (0x4E00, 0x9FFF, "cjk"),
    (0xAC00, 0xD7AF, "hangul"),
    (0x0370, 0x03FF, "greek"),
]

_SCRIPT_TO_LANG = {
    "cyrillic": "ru", "hebrew": "he", "arabic": "ar", "devanagari": "hi",
    "bengali": "bn", "thai": "th", "hangul": "ko", "hiragana": "ja",
    "katakana": "ja", "cjk": "zh", "greek": "el",
}

# Function-word profiles for Latin-script languages.
_PROFILES: Dict[str, frozenset] = {
    "en": frozenset("the and of to in is that it was for with as his on be at by".split()),
    "es": frozenset("el la de que y en los del se las por un para con una su".split()),
    "fr": frozenset("le la de et les des en un du une que est pour dans qui".split()),
    "de": frozenset("der die und das von zu den mit sich auf ist im dem nicht ein".split()),
    "it": frozenset("il di che la e un a per in una sono del le si con non".split()),
    "pt": frozenset("o de a e que do da em um para com os no se na por".split()),
    "nl": frozenset("de het een en van in is dat op te zijn met voor aan er".split()),
    "sv": frozenset("och det att i en som på är av för med den till inte om".split()),
    "no": frozenset("og det er i en som på til av for med at han ikke den".split()),
    "da": frozenset("og det er i en som på til af for med at han ikke den".split()),
    "pl": frozenset("w i na z do nie to jest że się o jak po co za".split()),
    "tr": frozenset("bir ve bu da ne için ile olarak daha çok gibi ama en".split()),
    "id": frozenset("yang dan di dengan untuk dari pada ini itu adalah ke tidak".split()),
}


@dataclasses.dataclass
class DetectionResult:
    language: str
    confidence: float
    script: Optional[str] = None


def detect_script(text: str) -> Optional[str]:
    """Dominant non-Latin script by Unicode block counting (reference
    language.py:140-168)."""
    counts: Dict[str, int] = {}
    for ch in text:
        cp = ord(ch)
        for lo, hi, name in _SCRIPT_RANGES:
            if lo <= cp <= hi:
                counts[name] = counts.get(name, 0) + 1
                break
    if not counts:
        return None
    return max(counts.items(), key=lambda kv: kv[1])[0]


class LanguageDetector:
    """detect / detect_simple / detect_batch (reference language.py:66-138)."""

    def __init__(self, min_confidence: float = 0.5) -> None:
        self.min_confidence = min_confidence

    def detect(self, text: str) -> DetectionResult:
        text = (text or "").strip()
        if not text:
            return DetectionResult("unknown", 0.0)
        if LANGDETECT_AVAILABLE:
            try:
                langs = langdetect.detect_langs(text)
                if langs:
                    best = langs[0]
                    if best.prob >= self.min_confidence:
                        return DetectionResult(best.lang, float(best.prob),
                                               detect_script(text))
            except Exception:
                pass
        script = detect_script(text)
        if script is not None:
            return DetectionResult(_SCRIPT_TO_LANG.get(script, "unknown"), 0.9,
                                   script)
        # Latin-script: function-word profile scoring.
        words = [w for w in text.lower().split() if w.isalpha()]
        if not words:
            return DetectionResult("unknown", 0.0)
        scores = {
            lang: sum(1 for w in words if w in prof) / len(words)
            for lang, prof in _PROFILES.items()
        }
        lang, score = max(scores.items(), key=lambda kv: kv[1])
        confidence = min(1.0, 2.5 * score)
        if confidence < self.min_confidence:
            return DetectionResult("unknown", confidence)
        return DetectionResult(lang, confidence)

    def detect_simple(self, text: str) -> str:
        return self.detect(text).language

    def detect_batch(self, texts: Sequence[str]) -> List[DetectionResult]:
        return [self.detect(t) for t in texts]


class MultilingualEmbedder:
    """Multilingual encoder hook (reference language.py:171-225): MiniLM
    with multilingual weights when a checkpoint exists, else the
    language-agnostic hashing encoder."""

    DEFAULT_NAME = "paraphrase-multilingual-MiniLM-L12-v2"

    def __init__(self, name: str = DEFAULT_NAME, dim: int = 384) -> None:
        self.name = name
        self.dim = dim
        self._encoder = None

    @property
    def encoder(self):
        if self._encoder is None:
            from hybridsearch_tpu.models.minilm import weights_available

            if weights_available(self.name):
                from hybridsearch_tpu.models.minilm import MiniLMEncoder

                self._encoder = MiniLMEncoder(name=self.name, dim=self.dim)
            else:
                from hybridsearch_tpu.models.encoder import HashingEncoder

                self._encoder = HashingEncoder(dim=self.dim)
        return self._encoder

    def encode(self, texts: Sequence[str], batch_size: int = 64):
        return self.encoder.encode(texts, batch_size=batch_size)
