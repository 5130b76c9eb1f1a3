"""Transcript output writers: txt / srt / vtt / tsv / json.

The reference's only output is `print(language)` and a latency print
(/root/reference/Whisper/Whisper/Whisper.swift:39,
/root/reference/Whisper/Whisper/ContentView.swift:63); a usable framework
needs real transcript serialization.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, TextIO


def _srt_time(seconds: float) -> str:
    ms = round(seconds * 1000)
    h, ms = divmod(ms, 3_600_000)
    m, ms = divmod(ms, 60_000)
    s, ms = divmod(ms, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def _vtt_time(seconds: float) -> str:
    return _srt_time(seconds).replace(",", ".")


def write_txt(result: Dict[str, Any], f: TextIO) -> None:
    for seg in result["segments"]:
        print(seg["text"].strip(), file=f)


def write_srt(result: Dict[str, Any], f: TextIO) -> None:
    for i, seg in enumerate(result["segments"], start=1):
        print(f"{i}\n{_srt_time(seg['start'])} --> {_srt_time(seg['end'])}\n"
              f"{seg['text'].strip()}\n", file=f)


def write_vtt(result: Dict[str, Any], f: TextIO) -> None:
    print("WEBVTT\n", file=f)
    for seg in result["segments"]:
        print(f"{_vtt_time(seg['start'])} --> {_vtt_time(seg['end'])}\n"
              f"{seg['text'].strip()}\n", file=f)


def write_tsv(result: Dict[str, Any], f: TextIO) -> None:
    print("start\tend\ttext", file=f)
    for seg in result["segments"]:
        print(f"{round(seg['start'] * 1000)}\t{round(seg['end'] * 1000)}\t"
              f"{seg['text'].strip()}", file=f)


def write_json(result: Dict[str, Any], f: TextIO) -> None:
    json.dump(result, f, ensure_ascii=False, indent=2)


WRITERS = {
    "txt": write_txt,
    "srt": write_srt,
    "vtt": write_vtt,
    "tsv": write_tsv,
    "json": write_json,
}


def write_result(result: Dict[str, Any], audio_path: str, output_dir: str,
                 output_format: str = "txt") -> str:
    formats = list(WRITERS) if output_format == "all" else [output_format]
    os.makedirs(output_dir, exist_ok=True)
    base = os.path.splitext(os.path.basename(audio_path))[0]
    last = ""
    for fmt in formats:
        if fmt not in WRITERS:
            raise ValueError(f"unknown output format {fmt!r}; "
                             f"available: {sorted(WRITERS)} or 'all'")
        last = os.path.join(output_dir, f"{base}.{fmt}")
        with open(last, "w", encoding="utf-8") as f:
            WRITERS[fmt](result, f)
    return last
