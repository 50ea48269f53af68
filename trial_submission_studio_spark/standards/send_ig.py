"""SEND-IG v3.1.1 registry — the reference's third standards surface
(tss-standards/src/send_ig.rs + data/send/ig/v3.1.1: 30 datasets).

SEND (nonclinical) reuses SDTM's general observation classes, so the
dataset skeletons come from the same class-template builders as
:mod:`~trial_submission_studio_spark.standards.sdtm_domains` —
hand-written domain specs from public SEND-IG v3.1.1 knowledge, NOT
transcribed from the reference's CSVs. Datasets whose definitions are
identical in SDTM (CO, SE, TA, TE, TS, DM-base, SUPPQUAL, RELREC) are
reused from the SDTM registry with SEND structure notes.
"""

from __future__ import annotations

from trial_submission_studio_spark.standards.sdtm_domains import (
    DOMAINS as _SDTM,
    _events_vars,
    _findings_vars,
    _interventions_vars,
    _v,
)

_F = {"grpid", "spid", "cat", "scat", "stat", "epoch", "blfl", "drvfl"}


def _pool_idents(vs: list[dict]) -> list[dict]:
    """SEND records may key on POOLID instead of USUBJID (pooled
    specimens): add POOLID after USUBJID, relax USUBJID to Exp."""
    out = []
    for v in vs:
        v = dict(v)
        if v["name"] == "USUBJID":
            v["core"] = "Exp"
            out.append(v)
            out.append(_v("POOLID", "Pool Identifier", "Perm", role="Identifier"))
        else:
            out.append(v)
    return out


def _build() -> dict[str, dict]:
    out: dict[str, dict] = {}

    findings = {
        "BG": ("Body Weight Gain", "One record per body weight gain per subject",
               "Body Weight Gain Test", _F | {"units", "numeric"}),
        "BW": ("Body Weight", "One record per body weight per subject",
               "Body Weight Test", _F | {"units", "numeric", "tpt"}),
        "CL": ("Clinical Observations",
               "One record per finding per observation per subject",
               "Clinical Observation Test",
               _F | {"units", "numeric", "loc", "lat", "sev_q", "tpt"}),
        "CV": ("Cardiovascular Test Results",
               "One record per finding per time point per visit per subject",
               "Cardiovascular Test", _F | {"units", "numeric", "method",
                                            "tpt"}),
        "DD": ("Death Diagnosis", "One record per finding per subject",
               "Death Diagnosis", {"grpid", "spid", "stat", "eval", "epoch"}),
        "EG": ("ECG Test Results",
               "One record per ECG observation per time point per subject",
               "ECG Test", _F | {"units", "numeric", "method", "eval", "tpt"},
               {"testcd_cl": "C71153", "test_cl": "C71152"}),
        "FW": ("Food and Water Consumption",
               "One record per food/water consumption per subject",
               "Food/Water Consumption Test", _F | {"units", "numeric"}),
        "LB": ("Laboratory Test Results",
               "One record per lab test per specimen per subject",
               "Lab Test or Examination",
               _F | {"refid", "units", "numeric", "nr", "spec", "method",
                     "nam", "fast", "tpt"},
               {"testcd_cl": "C65047", "test_cl": "C67154"}),
        "MA": ("Macroscopic Findings",
               "One record per finding per specimen per subject",
               "Macroscopic Examination", _F | {"spec", "loc", "lat", "dir"}),
        "MI": ("Microscopic Findings",
               "One record per finding per specimen per subject",
               "Microscopic Examination", _F | {"spec", "method", "loc",
                                                "lat", "dir", "eval"}),
        "OM": ("Organ Measurements",
               "One record per measurement per organ per subject",
               "Organ Measurement Test", _F | {"units", "numeric", "spec",
                                               "loc", "lat"}),
        "PC": ("Pharmacokinetics Concentrations",
               "One record per analyte per time point per subject",
               "Pharmacokinetic Test", _F | {"refid", "units", "numeric",
                                             "spec", "method", "nam", "tpt"}),
        "PP": ("Pharmacokinetics Parameters",
               "One record per PK parameter per profile per subject",
               "Parameter", (_F - {"blfl"}) | {"units", "numeric"}),
        "RE": ("Respiratory Test Results",
               "One record per finding per time point per subject",
               "Respiratory Test", _F | {"units", "numeric", "method", "tpt"}),
        "SC": ("Subject Characteristics",
               "One record per characteristic per subject",
               "Subject Characteristic", {"grpid", "spid", "cat", "scat",
                                          "stat", "units", "numeric",
                                          "epoch"}),
        "TF": ("Tumor Findings", "One record per tumor finding per subject",
               "Tumor Finding", _F | {"spec", "loc", "lat", "dir", "eval"}),
        "VS": ("Vital Signs", "One record per vital sign per time point per "
               "subject", "Vital Signs Test",
               _F | {"pos", "loc", "units", "numeric", "tpt"},
               {"testcd_cl": "C66741", "test_cl": "C67153",
                "unit_cl": "C66770"}),
    }
    for d, spec in findings.items():
        label, structure, test_label, feats = spec[0], spec[1], spec[2], spec[3]
        kw = spec[4] if len(spec) > 4 else {}
        feats = set(feats) - {"visits", "sev_q"}  # SEND uses study day, not visits
        vs = _findings_vars(d, test_label, feats, **kw)
        if "sev_q" in spec[3]:
            vs.insert(
                next(i for i, v in enumerate(vs) if v["role"] == "Timing"),
                _v(f"{d}SEV", "Severity", "Perm", role="Record Qualifier"),
            )
        out[d] = {"label": label, "class": "Findings", "structure": structure,
                  "variables": _pool_idents(vs)}

    out["DS"] = {
        "label": "Disposition",
        "class": "Events",
        "structure": "One record per disposition status per subject",
        "variables": _events_vars(
            "DS", "Disposition Event",
            {"grpid", "spid", "epoch", "dtc"},
            decod_core="Req",
        ),
    }
    for v in out["DS"]["variables"]:
        if v["name"] == "DSDECOD":
            v["codelist_code"] = "C66727"
    out["EX"] = {
        "label": "Exposure",
        "class": "Interventions",
        "structure": "One record per constant-dosing interval per subject",
        "variables": _interventions_vars(
            "EX", "Treatment",
            {"grpid", "spid", "dose", "route", "epoch", "dur", "lot"},
        ),
    }
    out["PM"] = {
        "label": "Palpable Masses",
        "class": "Findings",
        "structure": "One record per mass per observation per subject",
        "variables": _pool_idents(
            _findings_vars("PM", "Palpable Mass", _F | {"loc", "lat", "dir"})
        ),
    }
    out["POOLDEF"] = {
        "label": "Pool Definition",
        "class": "Relationship",
        "structure": "One record per pooled subject",
        "variables": [
            _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
            _v("POOLID", "Pool Identifier", "Req", role="Identifier"),
            _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        ],
    }
    out["TX"] = {
        "label": "Trial Sets",
        "class": "Trial Design",
        "structure": "One record per trial set parameter",
        "variables": [
            _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
            _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier",
               length=2),
            _v("SETCD", "Set Code", "Req", role="Topic", length=8),
            _v("SET", "Set Description", "Req", role="Synonym Qualifier"),
            _v("TXSEQ", "Sequence Number", "Req", "Num", role="Identifier"),
            _v("TXPARMCD", "Trial Set Parameter Short Name", "Req",
               role="Topic", length=8),
            _v("TXPARM", "Trial Set Parameter", "Req",
               role="Synonym Qualifier"),
            _v("TXVAL", "Trial Set Parameter Value", "Req",
               role="Result Qualifier"),
        ],
    }
    # definitions identical to SDTM, reused (SEND-IG adopts them)
    for same in ("DM", "CO", "SE", "TA", "TE", "TS", "SUPPQUAL", "RELREC"):
        out[same] = {
            "label": _SDTM[same]["label"],
            "class": _SDTM[same]["class"],
            "structure": _SDTM[same]["structure"],
            "variables": [dict(v) for v in _SDTM[same]["variables"]],
        }
    return out


SEND_DOMAINS: dict[str, dict] = _build()

for _d in SEND_DOMAINS.values():
    for _i, _var in enumerate(_d["variables"]):
        _var["order"] = _i + 1
