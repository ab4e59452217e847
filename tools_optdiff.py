"""Mechanically diff our argparse surface against the reference's.

Loads the reference ``Options`` parser (read-only import from
/root/reference/options/options.py) and ours, walks every action in the
global parser and each subparser, and prints per-flag drift in option
strings, dest, default, type, choices, and action kind.

Used by tests/test_options_parity.py; runnable standalone for a report.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys

REF_ROOT = os.environ.get("DVIE_REF_ROOT", "/root/reference")


def load_reference_parser() -> argparse.ArgumentParser:
    """Import the reference Options class and build its parser (no parse)."""
    path = os.path.join(REF_ROOT, "options", "options.py")
    spec = importlib.util.spec_from_file_location("_ref_options", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_options"] = mod
    spec.loader.exec_module(mod)
    opt = mod.Options()
    opt.initialize()
    return opt.parser


def _action_kind(a: argparse.Action) -> str:
    name = type(a).__name__
    if name == "_StoreTrueAction":
        return "store_true"
    if name == "_StoreFalseAction":
        return "store_false"
    if name == "_StoreAction":
        return "store"
    if name == "_SubParsersAction":
        return "subparsers"
    if name == "_HelpAction":
        return "help"
    return name


def action_table(parser: argparse.ArgumentParser) -> dict:
    """Map primary option string -> (dest, default, typename, choices, kind)."""
    table = {}
    for a in parser._actions:
        kind = _action_kind(a)
        if kind in ("help", "subparsers"):
            continue
        key = a.option_strings[0] if a.option_strings else a.dest
        typename = getattr(a.type, "__name__", None) if a.type else None
        choices = tuple(a.choices) if a.choices is not None else None
        table[key] = {
            "option_strings": tuple(a.option_strings),
            "dest": a.dest,
            "default": a.default,
            "type": typename,
            "choices": choices,
            "kind": kind,
        }
    return table


def subparser_map(parser: argparse.ArgumentParser) -> dict:
    for a in parser._actions:
        if _action_kind(a) == "subparsers":
            return dict(a.choices)
    return {}


def diff_tables(ref: dict, ours: dict, scope: str) -> list:
    """Return a list of human-readable drift lines (empty = parity)."""
    out = []
    for flag in sorted(set(ref) | set(ours)):
        if flag not in ours:
            out.append(f"{scope}: {flag} missing from ours "
                       f"(ref: {ref[flag]})")
            continue
        if flag not in ref:
            out.append(f"{scope}: {flag} is ours-only (ref has no such flag): "
                       f"{ours[flag]}")
            continue
        r, o = ref[flag], ours[flag]
        for field in ("option_strings", "dest", "default", "type", "choices",
                      "kind"):
            if r[field] != o[field]:
                out.append(f"{scope}: {flag}.{field}: "
                           f"ref={r[field]!r} ours={o[field]!r}")
    return out


def full_diff():
    from deep_video_interpolation_extrapolation_tpu.cli.options import (
        build_parser,
    )

    ref_parser = load_reference_parser()
    our_parser = build_parser()
    lines = diff_tables(action_table(ref_parser), action_table(our_parser),
                        "global")
    ref_subs = subparser_map(ref_parser)
    our_subs = subparser_map(our_parser)
    for name in sorted(set(ref_subs) | set(our_subs)):
        if name not in our_subs:
            lines.append(f"subparser {name} missing from ours")
            continue
        if name not in ref_subs:
            lines.append(f"subparser {name} is ours-only")
            continue
        lines += diff_tables(action_table(ref_subs[name]),
                             action_table(our_subs[name]), name)
    return lines


if __name__ == "__main__":
    drift = full_diff()
    for line in drift:
        print(line)
    print(f"-- {len(drift)} drift lines --")
