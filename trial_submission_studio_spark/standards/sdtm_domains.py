"""SDTM domain/variable registry — S6 (SURVEY.md §2.1), full IG v3.4.

The reference embeds the full SDTM-IG v3.4 Datasets/Variables CSVs
(tss-standards/src/sdtm_ig.rs:25-189; 63 datasets / ~1,917 variables).
This module builds the same surface — all 63 datasets — from
*class templates*, hand-written from public CDISC SDTM-IG v3.4
knowledge (NOT transcribed from the reference's data files): the IG's
general observation classes (Interventions / Events / Findings) define
a standard variable skeleton per class, and each domain is the
skeleton plus a compact spec of domain-specific qualifiers. Special
Purpose, Trial Design, Relationship and Study Reference datasets are
spelled out explicitly (they have no shared skeleton).

Variable dicts carry the fields the engine uses: name, label, core
(Req/Exp/Perm), data_type (Char/Num), role, codelist_code, order,
length, and described_value_domain (the inference tier between name
pattern and codelist — reference inference.rs:44-131).

A deployment can still override/extend via :func:`load_registry_csv`
(same schema, external file).
"""

from __future__ import annotations

import csv
import io

# Frequently shared CDISC CT codelist codes (public NCI-EVS C-codes).
_CL_NY = "C66742"         # No Yes Response
_CL_UNIT = "C71620"       # UNIT
_CL_ROUTE = "C66729"      # Route of Administration
_CL_FREQ = "C71113"       # Frequency
_CL_FRM = "C66726"        # Pharmaceutical Dosage Form
_CL_ND = "C66789"         # Not Done (completion status)
_CL_EPOCH = "C99079"      # Epoch
_CL_LOC = "C74456"        # Anatomical Location
_CL_LAT = "C99073"        # Laterality
_CL_DIR = "C99074"        # Directionality
_CL_PORTOT = "C99075"     # Portion/Totality
_CL_NRIND = "C78736"      # Reference Range Indicator
_CL_TOXGR = "C66784"      # Toxicity Grade
_CL_STENRF = "C66728"     # Relation to Reference Period
_CL_METHOD = "C85492"     # Method
_CL_EVAL = "C78735"       # Evaluator
_CL_POSITION = "C71148"   # Position
_CL_ISO8601_DTC = ""      # (DTC precision is a described value domain, not CT)

_DVD_DATETIME = "ISO 8601 datetime or interval"
_DVD_DURATION = "ISO 8601 duration"


def _v(
    name,
    label,
    core="Perm",
    data_type="Char",
    role="",
    codelist="",
    length=None,
    dvd="",
):
    return {
        "name": name,
        "label": label,
        "core": core,
        "data_type": data_type,
        "role": role,
        "codelist_code": codelist,
        "length": length,
        "described_value_domain": dvd,
    }


def _dtc(name, label, core="Perm"):
    """Timing date/time variable: ISO 8601 described value domain."""
    return _v(name, label, core, role="Timing", dvd=_DVD_DATETIME)


# ---------------------------------------------------------------------------
# shared blocks (general observation classes, public SDTM-IG v3.4 §4)
# ---------------------------------------------------------------------------

def _idents(d: str, feats: set) -> list[dict]:
    out = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier", length=2),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v(f"{d}SEQ", "Sequence Number", "Req", "Num", role="Identifier"),
    ]
    if "grpid" in feats:
        out.append(_v(f"{d}GRPID", "Group ID", "Perm", role="Identifier"))
    if "refid" in feats:
        out.append(_v(f"{d}REFID", "Reference ID", "Perm", role="Identifier"))
    if "spid" in feats:
        out.append(
            _v(f"{d}SPID", "Sponsor-Defined Identifier", "Perm", role="Identifier")
        )
    if "lnkid" in feats:
        out.append(_v(f"{d}LNKID", "Link ID", "Perm", role="Identifier"))
    if "lnkgrp" in feats:
        out.append(_v(f"{d}LNKGRP", "Link Group ID", "Perm", role="Identifier"))
    return out


def _visit_block(feats: set) -> list[dict]:
    out = []
    if "visits" in feats:
        out += [
            _v("VISITNUM", "Visit Number", "Exp", "Num", role="Timing"),
            _v("VISIT", "Visit Name", "Perm", role="Timing"),
            _v("VISITDY", "Planned Study Day of Visit", "Perm", "Num", role="Timing"),
        ]
    if "taetord" in feats or "epoch" in feats:
        # the IG pairs TAETORD with EPOCH on general-observation datasets
        out.append(
            _v("TAETORD", "Planned Order of Element within Arm", "Perm", "Num",
               role="Timing")
        )
    if "epoch" in feats:
        out.append(_v("EPOCH", "Epoch", "Perm", role="Timing", codelist=_CL_EPOCH))
    return out


def _point_timing(d: str, what: str, feats: set) -> list[dict]:
    """--DTC/--DY (+ optional time-point block) for Findings."""
    out = [
        _dtc(f"{d}DTC", f"Date/Time of {what}", "Exp"),
        _v(f"{d}DY", f"Study Day of {what}", "Perm", "Num", role="Timing"),
    ]
    if "tpt" in feats:
        out += [
            _v(f"{d}TPT", "Planned Time Point Name", "Perm", role="Timing"),
            _v(f"{d}TPTNUM", "Planned Time Point Number", "Perm", "Num",
               role="Timing"),
            _v(f"{d}ELTM", "Planned Elapsed Time from Time Point Ref", "Perm",
               role="Timing", dvd=_DVD_DURATION),
            _v(f"{d}TPTREF", "Time Point Reference", "Perm", role="Timing"),
            _dtc(f"{d}RFTDTC", "Date/Time of Reference Time Point"),
        ]
    if "evlint" in feats:
        out += [
            _v(f"{d}EVLINT", "Evaluation Interval", "Perm", role="Timing",
               dvd=_DVD_DURATION),
            _v(f"{d}EVINTX", "Evaluation Interval Text", "Perm", role="Timing"),
        ]
    return out


def _interval_timing(d: str, what: str, feats: set) -> list[dict]:
    """--STDTC/--ENDTC/--STDY/--ENDY (+--DUR, +--DTC) for Events/Interventions."""
    out = []
    if "dtc" in feats:
        out.append(_dtc(f"{d}DTC", f"Date/Time of Collection"))
        out.append(_v(f"{d}DY", "Study Day of Collection", "Perm", "Num",
                      role="Timing"))
    out += [
        _dtc(f"{d}STDTC", f"Start Date/Time of {what}", "Exp"),
        _dtc(f"{d}ENDTC", f"End Date/Time of {what}"),
        _v(f"{d}STDY", f"Study Day of Start of {what}", "Perm", "Num",
           role="Timing"),
        _v(f"{d}ENDY", f"Study Day of End of {what}", "Perm", "Num", role="Timing"),
    ]
    if "dur" in feats:
        out.append(_v(f"{d}DUR", f"Duration of {what}", "Perm", role="Timing",
                      dvd=_DVD_DURATION))
    if "strf" in feats:
        out += [
            _v(f"{d}STRF", f"Start Relative to Reference Period", "Perm",
               role="Timing", codelist=_CL_STENRF),
            _v(f"{d}ENRF", f"End Relative to Reference Period", "Perm",
               role="Timing", codelist=_CL_STENRF),
        ]
    if "rtpt" in feats:
        out += [
            _v(f"{d}STRTPT", "Start Relative to Reference Time Point", "Perm",
               role="Timing", codelist=_CL_STENRF),
            _dtc(f"{d}STTPT", "Start Reference Time Point"),
            _v(f"{d}ENRTPT", "End Relative to Reference Time Point", "Perm",
               role="Timing", codelist=_CL_STENRF),
            _dtc(f"{d}ENTPT", "End Reference Time Point"),
        ]
    return out


def _findings_vars(
    d: str,
    test_label: str,
    feats: set,
    extras_q: list | None = None,
    testcd_cl: str = "",
    test_cl: str = "",
    cat_cl: str = "",
    unit_cl: str = _CL_UNIT,
    orres_label: str = "Result or Finding in Original Units",
) -> list[dict]:
    """Findings-class skeleton (public SDTM-IG v3.4 §4.5, §6.3)."""
    vs = _idents(d, feats)
    if "spdevid" in feats:
        vs.insert(3, _v("SPDEVID", "Sponsor Device Identifier", "Perm",
                        role="Identifier"))
    if "focid" in feats:
        vs.append(_v("FOCID", "Focus of Study-Specific Interest", "Perm",
                     role="Identifier"))
    if "nhoid" in feats:
        vs.append(_v("NHOID", "Non-host Organism ID", "Perm",
                     role="Identifier"))
    vs += [
        _v(f"{d}TESTCD", f"{test_label} Short Name", "Req", role="Topic",
           codelist=testcd_cl, length=8),
        _v(f"{d}TEST", f"{test_label} Name", "Req", role="Synonym Qualifier",
           codelist=test_cl, length=40),
    ]
    if "tstdtl" in feats:
        vs.append(_v(f"{d}TSTDTL", "Measurement, Test or Examination Detail",
                     "Perm", role="Topic"))
    if "obj" in feats:
        vs.append(_v(f"{d}OBJ", "Object of the Observation", "Req",
                     role="Record Qualifier"))
    if "cat" in feats:
        vs.append(_v(f"{d}CAT", f"Category for {test_label}", "Perm",
                     role="Grouping Qualifier", codelist=cat_cl))
    if "scat" in feats:
        vs.append(_v(f"{d}SCAT", f"Subcategory for {test_label}", "Perm",
                     role="Grouping Qualifier"))
    vs.append(_v(f"{d}ORRES", orres_label, "Exp", role="Result Qualifier"))
    if "units" in feats:
        vs.append(_v(f"{d}ORRESU", "Original Units", "Exp",
                     role="Variable Qualifier", codelist=unit_cl))
    if "nr" in feats:
        vs += [
            _v(f"{d}ORNRLO", "Reference Range Lower Limit in Orig Unit", "Perm",
               role="Variable Qualifier"),
            _v(f"{d}ORNRHI", "Reference Range Upper Limit in Orig Unit", "Perm",
               role="Variable Qualifier"),
        ]
    vs.append(_v(f"{d}STRESC", "Character Result/Finding in Std Format", "Exp",
                 role="Result Qualifier"))
    if "rescat" in feats:
        vs.append(_v(f"{d}RESCAT", "Result Category", "Perm",
                     role="Variable Qualifier"))
    if "numeric" in feats:
        vs.append(_v(f"{d}STRESN", "Numeric Result/Finding in Standard Units",
                     "Exp", "Num", role="Result Qualifier"))
    if "units" in feats:
        vs.append(_v(f"{d}STRESU", "Standard Units", "Exp",
                     role="Variable Qualifier", codelist=unit_cl))
    if "nr" in feats:
        vs += [
            _v(f"{d}STNRLO", "Reference Range Lower Limit-Std Units", "Perm",
               "Num", role="Variable Qualifier"),
            _v(f"{d}STNRHI", "Reference Range Upper Limit-Std Units", "Perm",
               "Num", role="Variable Qualifier"),
            _v(f"{d}STNRC", "Reference Range for Char Rslt-Std Units", "Perm",
               role="Variable Qualifier"),
            _v(f"{d}NRIND", "Reference Range Indicator", "Perm",
               role="Variable Qualifier", codelist=_CL_NRIND),
        ]
    if "stat" in feats:
        vs += [
            _v(f"{d}STAT", "Completion Status", "Perm", role="Record Qualifier",
               codelist=_CL_ND),
            _v(f"{d}REASND", "Reason Not Done", "Perm", role="Record Qualifier"),
        ]
    if "nam" in feats:
        vs.append(_v(f"{d}NAM", "Vendor Name", "Perm", role="Record Qualifier"))
    if "loinc" in feats:
        vs.append(_v(f"{d}LOINC", "LOINC Code", "Perm", role="Synonym Qualifier"))
    if "spec" in feats:
        vs += [
            _v(f"{d}SPEC", "Specimen Type", "Perm", role="Record Qualifier",
               codelist="C78734"),
            _v(f"{d}SPCCND", "Specimen Condition", "Perm",
               role="Record Qualifier", codelist="C78733"),
        ]
    if "loc" in feats:
        vs.append(_v(f"{d}LOC", "Location of the Finding", "Perm",
                     role="Record Qualifier", codelist=_CL_LOC))
    if "lat" in feats:
        vs.append(_v(f"{d}LAT", "Laterality", "Perm", role="Variable Qualifier",
                     codelist=_CL_LAT))
    if "dir" in feats:
        vs.append(_v(f"{d}DIR", "Directionality", "Perm",
                     role="Variable Qualifier", codelist=_CL_DIR))
    if "portot" in feats:
        vs.append(_v(f"{d}PORTOT", "Portion or Totality", "Perm",
                     role="Variable Qualifier", codelist=_CL_PORTOT))
    if "method" in feats:
        vs.append(_v(f"{d}METHOD", "Method of Test or Examination", "Perm",
                     role="Record Qualifier", codelist=_CL_METHOD))
    if "lobxfl" in feats:
        vs.append(_v(f"{d}LOBXFL", "Last Observation Before Exposure Flag",
                     "Exp", role="Record Qualifier", codelist=_CL_NY))
    if "blfl" in feats:
        vs.append(_v(f"{d}BLFL", "Baseline Flag", "Perm",
                     role="Record Qualifier", codelist=_CL_NY))
    if "fast" in feats:
        vs.append(_v(f"{d}FAST", "Fasting Status", "Perm",
                     role="Record Qualifier", codelist=_CL_NY))
    if "drvfl" in feats:
        vs.append(_v(f"{d}DRVFL", "Derived Flag", "Perm",
                     role="Record Qualifier", codelist=_CL_NY))
    if "eval" in feats:
        vs.append(_v(f"{d}EVAL", "Evaluator", "Perm", role="Record Qualifier",
                     codelist=_CL_EVAL))
    if "evalid" in feats:
        vs.append(_v(f"{d}EVALID", "Evaluator Identifier", "Perm",
                     role="Variable Qualifier"))
    if "acptfl" in feats:
        vs.append(_v(f"{d}ACPTFL", "Accepted Record Flag", "Perm",
                     role="Record Qualifier", codelist=_CL_NY))
    if "repnum" in feats:
        vs.append(_v(f"{d}REPNUM", "Repetition Number", "Perm", "Num",
                     role="Record Qualifier"))
    if "xfn" in feats:
        vs.append(_v(f"{d}XFN", "External File Path", "Perm",
                     role="Record Qualifier"))
    if "tox" in feats:
        vs += [
            _v(f"{d}TOX", "Toxicity", "Perm", role="Variable Qualifier"),
            _v(f"{d}TOXGR", "Standard Toxicity Grade", "Perm",
               role="Variable Qualifier", codelist=_CL_TOXGR),
        ]
    vs += extras_q or []
    vs += _visit_block(feats)
    vs += _point_timing(d, test_label, feats)
    return vs


def _events_vars(
    d: str,
    term_label: str,
    feats: set,
    extras_q: list | None = None,
    decod_core: str = "Perm",
) -> list[dict]:
    """Events-class skeleton (public SDTM-IG v3.4 §4.5, §6.2)."""
    vs = _idents(d, feats)
    vs.append(_v(f"{d}TERM", f"Reported Term for the {term_label}", "Req",
                 role="Topic"))
    if "modify" in feats:
        vs.append(_v(f"{d}MODIFY", "Modified Reported Term", "Perm",
                     role="Synonym Qualifier"))
    vs.append(_v(f"{d}DECOD", "Dictionary-Derived Term", decod_core,
                 role="Synonym Qualifier"))
    vs += [
        _v(f"{d}CAT", f"Category for {term_label}", "Perm",
           role="Grouping Qualifier"),
        _v(f"{d}SCAT", f"Subcategory for {term_label}", "Perm",
           role="Grouping Qualifier"),
    ]
    if "presp" in feats:
        vs += [
            _v(f"{d}PRESP", "Pre-Specified", "Perm", role="Variable Qualifier",
               codelist=_CL_NY),
            _v(f"{d}OCCUR", f"{term_label} Occurrence", "Perm",
               role="Record Qualifier", codelist=_CL_NY),
        ]
    if "stat" in feats:
        vs += [
            _v(f"{d}STAT", "Completion Status", "Perm", role="Record Qualifier",
               codelist=_CL_ND),
            _v(f"{d}REASND", "Reason Not Done", "Perm", role="Record Qualifier"),
        ]
    if "bodsys" in feats:
        vs += [
            _v(f"{d}BODSYS", "Body System or Organ Class", "Exp",
               role="Record Qualifier"),
            _v(f"{d}BDSYCD", "Body System or Organ Class Code", "Perm", "Num",
               role="Record Qualifier"),
        ]
    vs += extras_q or []
    vs += _visit_block(feats)
    vs += _interval_timing(d, term_label, feats)
    return vs


def _interventions_vars(
    d: str,
    trt_label: str,
    feats: set,
    extras_q: list | None = None,
) -> list[dict]:
    """Interventions-class skeleton (public SDTM-IG v3.4 §4.5, §6.1)."""
    vs = _idents(d, feats)
    vs.append(_v(f"{d}TRT", f"Reported Name of {trt_label}", "Req", role="Topic"))
    if "modify" in feats:
        vs.append(_v(f"{d}MODIFY", "Modified Reported Name", "Perm",
                     role="Synonym Qualifier"))
    if "decod" in feats:
        vs.append(_v(f"{d}DECOD", f"Standardized {trt_label} Name", "Perm",
                     role="Synonym Qualifier"))
    vs += [
        _v(f"{d}CAT", f"Category for {trt_label}", "Perm",
           role="Grouping Qualifier"),
        _v(f"{d}SCAT", f"Subcategory for {trt_label}", "Perm",
           role="Grouping Qualifier"),
    ]
    if "presp" in feats:
        vs += [
            _v(f"{d}PRESP", "Pre-Specified", "Perm", role="Variable Qualifier",
               codelist=_CL_NY),
            _v(f"{d}OCCUR", f"{trt_label} Occurrence", "Perm",
               role="Record Qualifier", codelist=_CL_NY),
        ]
    if "stat" in feats:
        vs += [
            _v(f"{d}STAT", "Completion Status", "Perm", role="Record Qualifier",
               codelist=_CL_ND),
            _v(f"{d}REASND", "Reason Not Done", "Perm", role="Record Qualifier"),
        ]
    if "indc" in feats:
        vs.append(_v(f"{d}INDC", "Indication", "Perm", role="Record Qualifier"))
    if "clas" in feats:
        vs += [
            _v(f"{d}CLAS", f"{trt_label} Class", "Perm", role="Variable Qualifier"),
            _v(f"{d}CLASCD", f"{trt_label} Class Code", "Perm",
               role="Variable Qualifier"),
        ]
    if "dose" in feats:
        vs += [
            _v(f"{d}DOSE", "Dose", "Exp", "Num", role="Record Qualifier"),
            _v(f"{d}DOSTXT", "Dose Description", "Perm", role="Record Qualifier"),
            _v(f"{d}DOSU", "Dose Units", "Exp", role="Variable Qualifier",
               codelist=_CL_UNIT),
            _v(f"{d}DOSFRM", "Dose Form", "Exp", role="Variable Qualifier",
               codelist=_CL_FRM),
            _v(f"{d}DOSFRQ", "Dosing Frequency per Interval", "Perm",
               role="Variable Qualifier", codelist=_CL_FREQ),
            _v(f"{d}DOSTOT", "Total Daily Dose", "Perm", "Num",
               role="Record Qualifier"),
            _v(f"{d}DOSRGM", "Intended Dose Regimen", "Perm",
               role="Variable Qualifier"),
        ]
    if "route" in feats:
        vs.append(_v(f"{d}ROUTE", "Route of Administration", "Perm",
                     role="Variable Qualifier", codelist=_CL_ROUTE))
    if "lot" in feats:
        vs.append(_v(f"{d}LOT", "Lot Number", "Perm", role="Record Qualifier"))
    if "loc" in feats:
        vs.append(_v(f"{d}LOC", "Location of Dose Administration", "Perm",
                     role="Record Qualifier", codelist=_CL_LOC))
    if "lat" in feats:
        vs.append(_v(f"{d}LAT", "Laterality", "Perm", role="Variable Qualifier",
                     codelist=_CL_LAT))
    if "fast" in feats:
        vs.append(_v(f"{d}FAST", "Fasting Status", "Perm",
                     role="Record Qualifier", codelist=_CL_NY))
    vs += extras_q or []
    vs += _visit_block(feats)
    vs += _interval_timing(d, trt_label, feats)
    return vs


# ---------------------------------------------------------------------------
# domain specs — all 63 SDTM-IG v3.4 datasets
# (class + label + structure from the public IG; per-domain features)
# ---------------------------------------------------------------------------

_F_BASE = {"grpid", "spid", "cat", "scat", "stat", "visits", "epoch", "blfl",
           "drvfl"}
_E_BASE = {"grpid", "refid", "spid", "presp", "stat", "epoch", "dur", "strf"}
_I_BASE = {"grpid", "spid", "presp", "stat", "dose", "route", "epoch", "dur",
           "strf"}

# Interventions
_INTERVENTIONS: dict[str, tuple] = {
    "AG": ("Procedure Agents",
           "One record per recorded intervention occurrence per subject",
           "Agent", _I_BASE | {"decod", "modify", "clas", "visits", "lnkid",
                               "lnkgrp", "rtpt"}),
    "CM": ("Concomitant/Prior Medications",
           "One record per recorded intervention occurrence or "
           "constant-dosing interval per subject",
           "Medication", _I_BASE | {"modify", "decod", "indc", "clas", "rtpt"}),
    "EC": ("Exposure as Collected",
           "One record per protocol-specified study treatment, "
           "collected-dosing interval, per subject, per mood",
           "Treatment", _I_BASE | {"modify", "visits", "taetord", "lot", "loc",
                                   "lat", "fast", "dtc", "refid", "lnkid",
                                   "lnkgrp"}),
    "EX": ("Exposure",
           "One record per protocol-specified study treatment, "
           "constant-dosing interval, per subject",
           "Treatment", _I_BASE | {"visits", "taetord", "lot", "loc", "lat",
                                   "fast"}),
    "ML": ("Meal Data",
           "One record per food product occurrence or constant intake "
           "interval per subject",
           "Meal Item", _I_BASE | {"visits", "fast"}),
    "PR": ("Procedures",
           "One record per recorded procedure per occurrence per subject",
           "Procedure", _I_BASE | {"modify", "decod", "indc", "visits",
                                   "taetord", "loc", "lat", "lnkid",
                                   "lnkgrp", "rtpt"}),
    "SU": ("Substance Use",
           "One record per substance type per reported occurrence per subject",
           "Substance", _I_BASE | {"modify", "decod", "clas", "visits", "rtpt"}),
}

# Events
_EVENTS: dict[str, tuple] = {
    "AE": ("Adverse Events", "One record per adverse event per subject",
           "Adverse Event",
           (_E_BASE - {"stat", "strf"}) | {"modify", "bodsys", "rtpt"}),
    "BE": ("Biospecimen Events",
           "One record per instance per biospecimen event per biospecimen "
           "identifier per subject",
           "Biospecimen Event", {"grpid", "refid", "spid", "epoch", "dur",
                                 "visits", "lnkid", "lnkgrp"}),
    "CE": ("Clinical Events", "One record per event per subject",
           "Clinical Event", _E_BASE | {"modify", "bodsys", "visits", "rtpt"}),
    "DS": ("Disposition",
           "One record per disposition status or protocol milestone per subject",
           "Disposition Event", {"grpid", "refid", "spid", "epoch", "dtc"}),
    "DV": ("Protocol Deviations", "One record per protocol deviation per subject",
           "Protocol Deviation", {"grpid", "refid", "spid", "epoch", "dur",
                                  "visits"}),
    "HO": ("Healthcare Encounters", "One record per healthcare encounter per subject",
           "Healthcare Encounter", _E_BASE | {"modify", "visits", "rtpt"}),
    "MH": ("Medical History", "One record per medical history event per subject",
           "Medical History Event",
           _E_BASE | {"modify", "bodsys", "visits", "dtc", "rtpt"}),
}

# Findings (feats beyond the base skeleton)
_FINDINGS: dict[str, tuple] = {
    "BS": ("Biospecimen Findings",
           "One record per measurement per biospecimen identifier per subject",
           "Biospecimen Test", _F_BASE | {"refid", "units", "numeric", "spec",
                                          "method", "nam", "tpt"}),
    "CP": ("Cell Phenotype Findings",
           "One record per test per specimen per timepoint per visit per subject",
           "Cell Phenotype Test", _F_BASE | {"refid", "units", "numeric", "nr",
                                             "spec", "method", "nam", "loinc",
                                             "fast", "tox", "tpt", "lobxfl",
                                             "lnkid", "lnkgrp", "tstdtl",
                                             "rescat"}),
    "CV": ("Cardiovascular System Findings",
           "One record per finding or result per time point per visit per subject",
           "Cardiovascular Test", _F_BASE | {"units", "numeric", "loc", "lat",
                                             "dir", "method", "eval", "tpt",
                                             "lobxfl", "refid", "lnkid",
                                             "lnkgrp", "pos", "evalid"}),
    "DA": ("Product Accountability",
           "One record per product accountability finding per subject",
           "Product Accountability Test",
           _F_BASE | {"refid", "units", "numeric"}),
    "DD": ("Death Details", "One record per finding per subject",
           "Death Diagnosis",
           {"grpid", "spid", "stat", "eval", "epoch", "drvfl"}),
    "EG": ("ECG Test Results",
           "One record per ECG observation per replicate per time point or one "
           "record per ECG observation per beat per visit per subject",
           "ECG Test", _F_BASE | {"refid", "units", "numeric", "pos", "method",
                                  "eval", "nam", "tpt", "lobxfl"},
           {"testcd_cl": "C71153", "test_cl": "C71152"}),
    "FT": ("Functional Tests",
           "One record per Functional Test finding per time point per visit "
           "per subject",
           "Functional Test", _F_BASE | {"units", "numeric", "method", "tpt",
                                         "lobxfl", "refid", "pos", "xfn",
                                         "nam", "repnum"}),
    "GF": ("Genomics Findings",
           "One record per finding per observation per biospecimen per subject",
           "Genomics Test", _F_BASE | {"refid", "units", "numeric", "spec",
                                       "method", "nam", "tpt", "spdevid",
                                       "nhoid", "lnkid", "lnkgrp", "tstdtl",
                                       "rescat"}),
    "IE": ("Inclusion/Exclusion Criteria Not Met",
           "One record per inclusion/exclusion criterion not met per subject",
           "Incl/Excl Criterion",
           {"grpid", "spid", "cat", "scat", "visits", "taetord", "epoch"},
           {"cat_cl": "C66797", "orres_label": "I/E Criterion Original Result"}),
    "IS": ("Immunogenicity Specimen Assessments",
           "One record per test per visit per subject",
           "Immunogenicity Test", _F_BASE | {"refid", "units", "numeric", "nr",
                                             "spec", "method", "nam", "loinc",
                                             "tpt", "lobxfl", "nhoid",
                                             "tstdtl"}),
    "LB": ("Laboratory Test Results",
           "One record per lab test per time point per visit per subject",
           "Lab Test or Examination",
           _F_BASE | {"refid", "units", "numeric", "nr", "spec", "method",
                      "nam", "loinc", "fast", "tox", "tpt", "lobxfl"},
           {"testcd_cl": "C65047", "test_cl": "C67154"}),
    "MB": ("Microbiology Specimen",
           "One record per microbiology specimen finding per time point per "
           "visit per subject",
           "Microbiology Test", _F_BASE | {"refid", "units", "numeric", "spec",
                                           "method", "nam", "loc", "lat", "dir",
                                           "tpt", "focid", "lnkid", "lnkgrp",
                                           "tstdtl", "rescat", "loinc",
                                           "lobxfl", "fast"}),
    "MI": ("Microscopic Findings",
           "One record per finding per specimen per subject",
           "Microscopic Examination", _F_BASE | {"refid", "units", "numeric",
                                                 "spec", "method", "nam", "eval",
                                                 "loc", "lat", "dir"}),
    "MK": ("Musculoskeletal System Findings",
           "One record per assessment per visit per subject",
           "Musculoskeletal Exam", _F_BASE | {"units", "numeric", "loc", "lat",
                                              "dir", "method", "eval", "tpt",
                                              "lobxfl", "refid", "lnkid",
                                              "lnkgrp", "pos", "evalid"}),
    "MS": ("Microbiology Susceptibility",
           "One record per microbiology susceptibility test (or other "
           "organism-related finding) per organism found in MB",
           "Microbiology Susceptibility Test",
           _F_BASE | {"refid", "units", "numeric", "nr", "spec", "method",
                      "nam", "tpt", "lnkid", "lnkgrp", "nhoid", "tstdtl",
                      "rescat", "xfn", "loinc", "loc", "lat", "dir"}),
    "NV": ("Nervous System Findings",
           "One record per finding per location per time point per visit per "
           "subject",
           "Nervous System Exam", _F_BASE | {"units", "numeric", "loc", "lat",
                                             "dir", "method", "eval", "tpt",
                                             "lobxfl", "focid", "refid",
                                             "lnkid", "lnkgrp", "evalid"}),
    "OE": ("Ophthalmic Examinations",
           "One record per ophthalmic finding per method per location, per "
           "time point per visit per subject",
           "Ophthalmic Exam", _F_BASE | {"units", "numeric", "nr", "loc", "lat",
                                         "dir", "method", "eval", "tpt",
                                         "lobxfl", "focid", "lnkid",
                                         "lnkgrp", "tstdtl", "rescat", "xfn",
                                         "portot", "evalid", "acptfl",
                                         "repnum"}),
    "PC": ("Pharmacokinetics Concentrations",
           "One record per sample characteristic or time-point concentration "
           "per reference time point or per analyte per subject",
           "Pharmacokinetic Test", _F_BASE | {"refid", "units", "numeric",
                                              "spec", "method", "nam", "fast",
                                              "tpt", "evlint"}),
    "PE": ("Physical Examination",
           "One record per body system or abnormality per visit per subject",
           "Body System Examined",
           {"grpid", "spid", "cat", "scat", "stat", "visits", "epoch", "loc",
            "lat", "dir", "method", "eval"},
           {"orres_label": "Verbatim Examination Finding"}),
    "PP": ("Pharmacokinetics Parameters",
           "One record per PK parameter per time-concentration profile per "
           "modeling method per subject",
           "Parameter", _F_BASE - {"blfl"} | {"units", "numeric", "rftdtc"}),
    "QS": ("Questionnaires",
           "One record per questionnaire per question per time point per visit "
           "per subject",
           "Question", _F_BASE | {"units", "numeric", "method", "taetord",
                                  "tpt", "evlint", "lobxfl"},
           {"cat_cl": "C100129"}),
    "RE": ("Respiratory System Findings",
           "One record per finding or result per time point per visit per "
           "subject",
           "Respiratory Test", _F_BASE | {"units", "numeric", "nr", "loc",
                                          "lat", "dir", "method", "eval", "tpt",
                                          "lobxfl", "spdevid", "refid",
                                          "lnkid", "lnkgrp", "pos", "evalid",
                                          "repnum"}),
    "RP": ("Reproductive System Findings",
           "One record per finding or result per time point per visit per "
           "subject",
           "Reproductive System Test", _F_BASE | {"units", "numeric", "method",
                                                  "tpt", "lobxfl"}),
    "RS": ("Disease Response and Clin Classification",
           "One record per response assessment or clinical classification "
           "assessment per time point per visit per subject per assessor per "
           "medical evaluator",
           "Response Assessment", _F_BASE | {"method", "eval", "loc", "lat",
                                             "tpt", "lnkid", "lnkgrp",
                                             "lobxfl", "refid", "units",
                                             "numeric", "nam", "evalid",
                                             "acptfl", "evlint"}),
    "SC": ("Subject Characteristics",
           "One record per characteristic per visit per subject.",
           "Subject Characteristic", {"grpid", "spid", "cat", "scat", "stat",
                                      "units", "numeric", "visits", "epoch"}),
    "SS": ("Subject Status", "One record per status per visit per subject",
           "Subject Status", {"grpid", "spid", "cat", "scat", "stat", "visits",
                              "epoch", "eval", "tpt"}),
    "TR": ("Tumor/Lesion Results",
           "One record per tumor measurement/assessment per visit per subject "
           "per assessor",
           "Tumor/Lesion Assessment", _F_BASE | {"refid", "units", "numeric",
                                                 "method", "eval", "loc", "lat",
                                                 "dir", "lnkid", "lnkgrp"}),
    "TU": ("Tumor/Lesion Identification",
           "One record per identified tumor per subject per assessor",
           "Tumor/Lesion Identification", {"grpid", "refid", "spid", "cat",
                                           "scat", "stat", "visits", "epoch",
                                           "method", "eval", "loc", "lat",
                                           "dir", "portot", "lnkid", "lnkgrp",
                                           "nam", "lobxfl", "blfl", "evalid",
                                           "acptfl"}),
    "UR": ("Urinary System Findings",
           "One record per finding per location per per visit per subject",
           "Urinary System Test", _F_BASE | {"units", "numeric", "loc", "lat",
                                             "dir", "method", "eval", "tpt",
                                             "lobxfl", "refid", "lnkid",
                                             "lnkgrp", "tstdtl", "rescat",
                                             "evalid"}),
    "VS": ("Vital Signs",
           "One record per vital sign measurement per time point per visit "
           "per subject",
           "Vital Signs Test", _F_BASE | {"pos", "loc", "lat", "units",
                                          "numeric", "nr", "tpt", "lobxfl"},
           {"testcd_cl": "C66741", "test_cl": "C67153", "unit_cl": "C66770"}),
}

# Findings About
_FINDINGS_ABOUT: dict[str, tuple] = {
    "FA": ("Findings About Events or Interventions",
           "One record per finding, per object, per time point, per visit per "
           "subject",
           "Findings About", _F_BASE | {"obj", "units", "numeric", "loc",
                                        "lat", "dir", "method", "eval", "tpt",
                                        "lobxfl"}),
    "SR": ("Skin Response",
           "One record per finding, per object, per time point, per visit per "
           "subject",
           "Skin Response Test", _F_BASE | {"obj", "units", "numeric", "loc",
                                            "lat", "dir", "method", "eval",
                                            "tpt", "lobxfl"}),
}


def _special_purpose() -> dict[str, dict]:
    dm = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier", length=2),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("SUBJID", "Subject Identifier for the Study", "Req", role="Topic"),
        _dtc("RFSTDTC", "Subject Reference Start Date/Time", "Exp"),
        _dtc("RFENDTC", "Subject Reference End Date/Time", "Exp"),
        _dtc("RFXSTDTC", "Date/Time of First Study Treatment", "Exp"),
        _dtc("RFXENDTC", "Date/Time of Last Study Treatment", "Exp"),
        _dtc("RFICDTC", "Date/Time of Informed Consent", "Exp"),
        _dtc("RFPENDTC", "Date/Time of End of Participation", "Exp"),
        _dtc("DTHDTC", "Date/Time of Death"),
        _v("DTHFL", "Subject Death Flag", "Exp", role="Record Qualifier",
           codelist=_CL_NY),
        _v("SITEID", "Study Site Identifier", "Req", role="Record Qualifier"),
        _v("INVID", "Investigator Identifier", "Perm", role="Record Qualifier"),
        _v("INVNAM", "Investigator Name", "Perm", role="Synonym Qualifier"),
        _dtc("BRTHDTC", "Date/Time of Birth"),
        _v("AGE", "Age", "Exp", "Num", role="Record Qualifier"),
        _v("AGEU", "Age Units", "Exp", role="Variable Qualifier",
           codelist="C66781"),
        _v("SEX", "Sex", "Req", role="Record Qualifier", codelist="C66731"),
        _v("RACE", "Race", "Exp", role="Record Qualifier", codelist="C74457"),
        _v("ETHNIC", "Ethnicity", "Perm", role="Record Qualifier",
           codelist="C66790"),
        _v("ARMCD", "Planned Arm Code", "Exp", role="Record Qualifier",
           length=20),
        _v("ARM", "Description of Planned Arm", "Exp", role="Synonym Qualifier"),
        _v("ACTARMCD", "Actual Arm Code", "Exp", role="Record Qualifier",
           length=20),
        _v("ACTARM", "Description of Actual Arm", "Exp", role="Synonym Qualifier"),
        _v("ARMNRS", "Reason Arm and/or Actual Arm is Null", "Exp",
           role="Record Qualifier"),
        _v("ACTARMUD", "Description of Unplanned Actual Arm", "Exp",
           role="Record Qualifier"),
        _v("COUNTRY", "Country", "Req", role="Record Qualifier"),
        _dtc("DMDTC", "Date/Time of Collection"),
        _v("DMDY", "Study Day of Collection", "Perm", "Num", role="Timing"),
    ]
    co = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier", length=2),
        _v("RDOMAIN", "Related Domain Abbreviation", "Perm", role="Identifier",
           length=2),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("COSEQ", "Sequence Number", "Req", "Num", role="Identifier"),
        _v("IDVAR", "Identifying Variable", "Perm", role="Identifier", length=8),
        _v("IDVARVAL", "Identifying Variable Value", "Perm", role="Identifier"),
        _v("COREF", "Comment Reference", "Perm", role="Record Qualifier"),
        _v("COVAL", "Comment", "Req", role="Topic"),
        _v("COEVAL", "Evaluator", "Perm", role="Record Qualifier",
           codelist=_CL_EVAL),
        _dtc("CODTC", "Date/Time of Comment"),
        _v("CODY", "Study Day of Comment", "Perm", "Num", role="Timing"),
    ]
    se = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier", length=2),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("SESEQ", "Sequence Number", "Req", "Num", role="Identifier"),
        _v("ETCD", "Element Code", "Req", role="Topic", length=8),
        _v("ELEMENT", "Description of Element", "Perm", role="Synonym Qualifier"),
        _dtc("SESTDTC", "Start Date/Time of Element", "Req"),
        _dtc("SEENDTC", "End Date/Time of Element", "Exp"),
        _v("SESTDY", "Study Day of Start of Element", "Perm", "Num",
           role="Timing"),
        _v("SEENDY", "Study Day of End of Element", "Perm", "Num", role="Timing"),
        _v("TAETORD", "Planned Order of Element within Arm", "Perm", "Num",
           role="Timing"),
        _v("EPOCH", "Epoch", "Perm", role="Timing", codelist=_CL_EPOCH),
        _v("SEUPDES", "Description of Unplanned Element", "Perm",
           role="Record Qualifier"),
    ]
    sv = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier", length=2),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("VISITNUM", "Visit Number", "Req", "Num", role="Topic"),
        _v("VISIT", "Visit Name", "Perm", role="Synonym Qualifier"),
        _v("VISITDY", "Planned Study Day of Visit", "Perm", "Num",
           role="Timing"),
        _v("SVPRESP", "Pre-Specified", "Perm", role="Variable Qualifier",
           codelist=_CL_NY),
        _v("SVOCCUR", "Visit Occurrence", "Perm", role="Record Qualifier",
           codelist=_CL_NY),
        _v("SVREASOC", "Reason for Occurrence Value", "Perm",
           role="Record Qualifier"),
        _dtc("SVSTDTC", "Start Date/Time of Visit", "Exp"),
        _dtc("SVENDTC", "End Date/Time of Visit", "Exp"),
        _v("SVSTDY", "Study Day of Start of Visit", "Perm", "Num",
           role="Timing"),
        _v("SVENDY", "Study Day of End of Visit", "Perm", "Num", role="Timing"),
        _v("SVUPDES", "Description of Unplanned Visit", "Perm",
           role="Record Qualifier"),
    ]
    sm = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier", length=2),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("SMSEQ", "Sequence Number", "Req", "Num", role="Identifier"),
        _v("MIDS", "Disease Milestone Instance Name", "Req", role="Topic"),
        _v("MIDSTYPE", "Disease Milestone Type", "Req", role="Record Qualifier"),
        _dtc("SMSTDTC", "Start Date/Time of Milestone", "Exp"),
        _dtc("SMENDTC", "End Date/Time of Milestone"),
        _v("SMSTDY", "Study Day of Start of Milestone", "Perm", "Num",
           role="Timing"),
        _v("SMENDY", "Study Day of End of Milestone", "Perm", "Num",
           role="Timing"),
    ]
    return {
        "DM": {"label": "Demographics", "class": "Special Purpose",
               "structure": "One record per subject", "variables": dm},
        "CO": {"label": "Comments", "class": "Special Purpose",
               "structure": "One record per comment per subject",
               "variables": co},
        "SE": {"label": "Subject Elements", "class": "Special Purpose",
               "structure": "One record per actual Element per subject",
               "variables": se},
        "SV": {"label": "Subject Visits", "class": "Special Purpose",
               "structure": "One record per actual or planned visit per subject",
               "variables": sv},
        "SM": {"label": "Subject Disease Milestones", "class": "Special Purpose",
               "structure": "One record per Disease Milestone per subject",
               "variables": sm},
    }


def _trial_design() -> dict[str, dict]:
    def hdr():
        return [
            _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
            _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier",
               length=2),
        ]

    ta = hdr() + [
        _v("ARMCD", "Planned Arm Code", "Req", role="Topic", length=20),
        _v("ARM", "Description of Planned Arm", "Req", role="Synonym Qualifier"),
        _v("TAETORD", "Planned Order of Element within Arm", "Req", "Num",
           role="Timing"),
        _v("ETCD", "Element Code", "Req", role="Record Qualifier", length=8),
        _v("ELEMENT", "Description of Element", "Perm", role="Synonym Qualifier"),
        _v("TABRANCH", "Branch", "Exp", role="Rule"),
        _v("TATRANS", "Transition Rule", "Exp", role="Rule"),
        _v("EPOCH", "Epoch", "Req", role="Timing", codelist=_CL_EPOCH),
    ]
    td = hdr() + [
        _v("TDORDER", "Sequence of Planned Assessment Schedule", "Req", "Num",
           role="Timing"),
        _v("TDANCVAR", "Anchor Variable Name", "Req", role="Record Qualifier"),
        _v("TDSTOFF", "Offset from the Anchor", "Req", role="Timing",
           dvd=_DVD_DURATION),
        _v("TDTGTPAI", "Planned Assessment Interval Target", "Req",
           role="Timing", dvd=_DVD_DURATION),
        _v("TDMINPAI", "Planned Assessment Interval Minimum", "Req",
           role="Timing", dvd=_DVD_DURATION),
        _v("TDMAXPAI", "Planned Assessment Interval Maximum", "Req",
           role="Timing", dvd=_DVD_DURATION),
        _v("TDNUMRPT", "Maximum Number of Actual Assessments", "Req", "Num",
           role="Record Qualifier"),
    ]
    te = hdr() + [
        _v("ETCD", "Element Code", "Req", role="Topic", length=8),
        _v("ELEMENT", "Description of Element", "Req", role="Synonym Qualifier"),
        _v("TESTRL", "Rule for Start of Element", "Req", role="Rule"),
        _v("TEENRL", "Rule for End of Element", "Exp", role="Rule"),
        _v("TEDUR", "Planned Duration of Element", "Exp", role="Timing",
           dvd=_DVD_DURATION),
    ]
    ti = hdr() + [
        _v("IETESTCD", "Incl/Excl Criterion Short Name", "Req", role="Topic",
           length=8),
        _v("IETEST", "Inclusion/Exclusion Criterion", "Req",
           role="Synonym Qualifier"),
        _v("IECAT", "Inclusion/Exclusion Category", "Req",
           role="Grouping Qualifier", codelist="C66797"),
        _v("IESCAT", "Inclusion/Exclusion Subcategory", "Perm",
           role="Grouping Qualifier"),
        _v("TIRL", "Inclusion/Exclusion Criterion Rule", "Perm", role="Rule"),
        _v("TIVERS", "Protocol Criteria Versions", "Perm",
           role="Record Qualifier"),
    ]
    tm = hdr() + [
        _v("MIDSTYPE", "Disease Milestone Type", "Req", role="Topic"),
        _v("TMDEF", "Disease Milestone Definition", "Req", role="Rule"),
        _v("TMRPT", "Disease Milestone Repetition Indicator", "Req",
           role="Record Qualifier", codelist=_CL_NY),
    ]
    ts = hdr() + [
        _v("TSSEQ", "Sequence Number", "Req", "Num", role="Identifier"),
        _v("TSGRPID", "Group ID", "Perm", role="Identifier"),
        _v("TSPARMCD", "Trial Summary Parameter Short Name", "Req",
           role="Topic", codelist="C66738", length=8),
        _v("TSPARM", "Trial Summary Parameter", "Req",
           role="Synonym Qualifier", codelist="C67152"),
        _v("TSVAL", "Parameter Value", "Exp", role="Result Qualifier"),
        _v("TSVALNF", "Parameter Null Flavor", "Perm", role="Result Qualifier"),
        _v("TSVALCD", "Parameter Value Code", "Exp", role="Result Qualifier"),
        _v("TSVCDREF", "Name of the Reference Terminology", "Exp",
           role="Result Qualifier"),
        _v("TSVCDVER", "Version of the Reference Terminology", "Exp",
           role="Result Qualifier"),
    ]
    tv = hdr() + [
        _v("VISITNUM", "Visit Number", "Req", "Num", role="Topic"),
        _v("VISIT", "Visit Name", "Perm", role="Synonym Qualifier"),
        _v("VISITDY", "Planned Study Day of Visit", "Perm", "Num",
           role="Timing"),
        _v("ARMCD", "Planned Arm Code", "Perm", role="Record Qualifier",
           length=20),
        _v("ARM", "Description of Planned Arm", "Perm",
           role="Synonym Qualifier"),
        _v("TVSTRL", "Visit Start Rule", "Req", role="Rule"),
        _v("TVENRL", "Visit End Rule", "Perm", role="Rule"),
    ]
    return {
        "TA": {"label": "Trial Arms", "class": "Trial Design",
               "structure": "One record per planned Element per Arm",
               "variables": ta},
        "TD": {"label": "Trial Disease Assessments", "class": "Trial Design",
               "structure": "One record per planned constant assessment period",
               "variables": td},
        "TE": {"label": "Trial Elements", "class": "Trial Design",
               "structure": "One record per planned Element", "variables": te},
        "TI": {"label": "Trial Inclusion/Exclusion Criteria",
               "class": "Trial Design",
               "structure": "One record per I/E criterion", "variables": ti},
        "TM": {"label": "Trial Disease Milestones", "class": "Trial Design",
               "structure": "One record per Disease Milestone type",
               "variables": tm},
        "TS": {"label": "Trial Summary", "class": "Trial Design",
               "structure": "One record per trial summary parameter value",
               "variables": ts},
        "TV": {"label": "Trial Visits", "class": "Trial Design",
               "structure": "One record per planned Visit per Arm",
               "variables": tv},
    }


def _relationship() -> dict[str, dict]:
    suppqual = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("RDOMAIN", "Related Domain Abbreviation", "Req", role="Identifier",
           length=2),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("IDVAR", "Identifying Variable", "Exp", role="Identifier", length=8),
        _v("IDVARVAL", "Identifying Variable Value", "Exp", role="Identifier"),
        _v("QNAM", "Qualifier Variable Name", "Req", role="Topic", length=8),
        _v("QLABEL", "Qualifier Variable Label", "Req",
           role="Synonym Qualifier", length=40),
        _v("QVAL", "Data Value", "Req", role="Result Qualifier"),
        _v("QORIG", "Origin", "Req", role="Record Qualifier"),
        _v("QEVAL", "Evaluator", "Perm", role="Record Qualifier",
           codelist=_CL_EVAL),
    ]
    relrec = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("RDOMAIN", "Related Domain Abbreviation", "Req", role="Identifier",
           length=2),
        _v("USUBJID", "Unique Subject Identifier", "Exp", role="Identifier"),
        _v("IDVAR", "Identifying Variable", "Req", role="Identifier", length=8),
        _v("IDVARVAL", "Identifying Variable Value", "Exp", role="Identifier"),
        _v("RELTYPE", "Relationship Type", "Perm", role="Record Qualifier",
           codelist="C66728"),
        _v("RELID", "Relationship Identifier", "Req", role="Record Qualifier"),
    ]
    relsub = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier", length=2),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("RSUBJID", "Related Subject Identifier", "Req", role="Identifier"),
        _v("SREL", "Subject Relationship", "Req", role="Topic"),
    ]
    relspec = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("REFID", "Specimen Identifier", "Req", role="Identifier"),
        _v("SPEC", "Specimen Type", "Exp", role="Record Qualifier",
           codelist="C78734"),
        _v("PARENT", "Identifier of Parent Specimen", "Exp",
           role="Record Qualifier"),
        _v("LEVEL", "Relationship Level", "Exp", "Num", role="Record Qualifier"),
    ]
    return {
        "SUPPQUAL": {
            "label": "Supplemental Qualifiers", "class": "Relationship",
            "structure": "One record per supplemental qualifier per related "
                         "parent domain record(s)",
            "variables": suppqual,
        },
        "RELREC": {
            "label": "Related Records", "class": "Relationship",
            "structure": "One record per related record, group of records or "
                         "dataset",
            "variables": relrec,
        },
        "RELSUB": {
            "label": "Related Subjects", "class": "Relationship",
            "structure": "One record per relationship per related subject per "
                         "subject",
            "variables": relsub,
        },
        "RELSPEC": {
            "label": "Related Specimens", "class": "Relationship",
            "structure": "One record per specimen identifier per subject",
            "variables": relspec,
        },
    }


def _study_reference() -> dict[str, dict]:
    oi = [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("DOMAIN", "Domain Abbreviation", "Req", role="Identifier", length=2),
        _v("OISEQ", "Sequence Number", "Req", "Num", role="Identifier"),
        _v("NHOID", "Non-host Organism ID", "Req", role="Identifier"),
        _v("OIPARMCD", "Identifier Parameter Short Name", "Req", role="Topic",
           length=8),
        _v("OIPARM", "Identifier Parameter Name", "Req",
           role="Synonym Qualifier"),
        _v("OIVAL", "Identifier Parameter Value", "Req",
           role="Result Qualifier"),
    ]
    return {
        "OI": {"label": "Non-host Organism Identifiers",
               "class": "Study Reference",
               "structure": "One record per taxon per non-host organism",
               "variables": oi},
    }


# Domain-specific qualifier extras that the class templates don't carry.
def _ae_extras() -> list[dict]:
    return [
        _v("AELLT", "Lowest Level Term", "Perm", role="Variable Qualifier"),
        _v("AELLTCD", "Lowest Level Term Code", "Perm", "Num",
           role="Variable Qualifier"),
        _v("AEPTCD", "Preferred Term Code", "Perm", "Num",
           role="Variable Qualifier"),
        _v("AEHLT", "High Level Term", "Perm", role="Variable Qualifier"),
        _v("AEHLTCD", "High Level Term Code", "Perm", "Num",
           role="Variable Qualifier"),
        _v("AEHLGT", "High Level Group Term", "Perm", role="Variable Qualifier"),
        _v("AEHLGTCD", "High Level Group Term Code", "Perm", "Num",
           role="Variable Qualifier"),
        _v("AESOC", "Primary System Organ Class", "Perm",
           role="Variable Qualifier"),
        _v("AESOCCD", "Primary System Organ Class Code", "Perm", "Num",
           role="Variable Qualifier"),
        _v("AELOC", "Location of Event", "Perm", role="Record Qualifier",
           codelist=_CL_LOC),
        _v("AESEV", "Severity/Intensity", "Perm", role="Record Qualifier",
           codelist="C66769"),
        _v("AESER", "Serious Event", "Exp", role="Record Qualifier",
           codelist=_CL_NY),
        _v("AEACN", "Action Taken with Study Treatment", "Exp",
           role="Record Qualifier", codelist="C66767"),
        _v("AEACNOTH", "Other Action Taken", "Perm", role="Record Qualifier"),
        _v("AEREL", "Causality", "Exp", role="Record Qualifier"),
        _v("AERELNST", "Relationship to Non-Study Treatment", "Perm",
           role="Record Qualifier"),
        _v("AEPATT", "Pattern of Adverse Event", "Perm",
           role="Record Qualifier"),
        _v("AEOUT", "Outcome of Adverse Event", "Perm", role="Record Qualifier",
           codelist="C66768"),
        _v("AESCAN", "Involves Cancer", "Perm", role="Record Qualifier",
           codelist=_CL_NY),
        _v("AESCONG", "Congenital Anomaly or Birth Defect", "Perm",
           role="Record Qualifier", codelist=_CL_NY),
        _v("AESDISAB", "Persist or Signif Disability/Incapacity", "Perm",
           role="Record Qualifier", codelist=_CL_NY),
        _v("AESDTH", "Results in Death", "Perm", role="Record Qualifier",
           codelist=_CL_NY),
        _v("AESHOSP", "Requires or Prolongs Hospitalization", "Perm",
           role="Record Qualifier", codelist=_CL_NY),
        _v("AESLIFE", "Is Life Threatening", "Perm", role="Record Qualifier",
           codelist=_CL_NY),
        _v("AESOD", "Occurred with Overdose", "Perm", role="Record Qualifier",
           codelist=_CL_NY),
        _v("AESMIE", "Other Medically Important Serious Event", "Perm",
           role="Record Qualifier", codelist=_CL_NY),
        _v("AECONTRT", "Concomitant or Additional Trtmnt Given", "Perm",
           role="Record Qualifier", codelist=_CL_NY),
        _v("AETOXGR", "Standard Toxicity Grade", "Perm",
           role="Record Qualifier", codelist=_CL_TOXGR),
    ]


def _event_sev_extras(d: str) -> list[dict]:
    return [
        _v(f"{d}SEV", "Severity/Intensity", "Perm", role="Record Qualifier",
           codelist="C66769"),
        _v(f"{d}SER", "Serious Event", "Perm", role="Record Qualifier",
           codelist=_CL_NY),
        _v(f"{d}ACN", "Action Taken with Study Treatment", "Perm",
           role="Record Qualifier", codelist="C66767"),
        _v(f"{d}REL", "Causality", "Perm", role="Record Qualifier"),
        _v(f"{d}OUT", "Outcome of Event", "Perm", role="Record Qualifier",
           codelist="C66768"),
    ]


def _ds_extras() -> list[dict]:
    return [
        _v("DSDECOD", "Standardized Disposition Term", "Req",
           role="Synonym Qualifier", codelist="C66727"),
        _v("DSCAT", "Category for Disposition Event", "Exp",
           role="Grouping Qualifier", codelist="C74558"),
        _v("DSSCAT", "Subcategory for Disposition Event", "Perm",
           role="Grouping Qualifier"),
    ]


def _build_domains() -> dict[str, dict]:
    out: dict[str, dict] = {}
    for d, (label, structure, trt_label, feats) in _INTERVENTIONS.items():
        out[d] = {"label": label, "class": "Interventions",
                  "structure": structure,
                  "variables": _interventions_vars(d, trt_label, feats)}
    for d, (label, structure, term_label, feats) in _EVENTS.items():
        if d == "AE":
            extras = _ae_extras()
        elif d == "CE":
            extras = _event_sev_extras(d)[:1]  # CESEV only
        elif d == "DS":
            extras = None  # DSDECOD/DSCAT handled below (replace DECOD slot)
        else:
            extras = None
        out[d] = {"label": label, "class": "Events", "structure": structure,
                  "variables": _events_vars(d, term_label, feats,
                                            extras_q=extras,
                                            decod_core="Req" if d in ("AE", "DS")
                                            else "Perm")}
    # DS carries its own decode/category codelists
    ds_vars = out["DS"]["variables"]
    out["DS"]["variables"] = [
        v for v in ds_vars if v["name"] not in ("DSDECOD", "DSCAT", "DSSCAT")
    ]
    term_ix = next(i for i, v in enumerate(out["DS"]["variables"])
                   if v["name"] == "DSTERM")
    out["DS"]["variables"][term_ix + 1:term_ix + 1] = _ds_extras()

    for d, spec in {**_FINDINGS, **_FINDINGS_ABOUT}.items():
        label, structure, test_label, feats = spec[0], spec[1], spec[2], spec[3]
        kw = spec[4] if len(spec) > 4 else {}
        cls = "Findings About" if d in _FINDINGS_ABOUT else "Findings"
        vs = _findings_vars(d, test_label, feats, **kw)
        if "pos" in feats:
            # position qualifier slots after the method/eval block
            vs.insert(
                next(i for i, v in enumerate(vs) if v["role"] == "Timing"),
                _v(f"{d}POS", f"Position of Subject During Observation",
                   "Perm", role="Record Qualifier", codelist=_CL_POSITION),
            )
        out[d] = {"label": label, "class": cls, "structure": structure,
                  "variables": vs}
    out.update(_special_purpose())
    out.update(_trial_design())
    out.update(_relationship())
    out.update(_study_reference())
    _apply_ig_adjustments(out)
    for d, names in _IG_TEMPLATE_OVERSHOOT.items():
        drop = set(names)
        out[d]["variables"] = [
            v for v in out[d]["variables"] if v["name"] not in drop
        ]
    return out


#: Class-template variables the published IG v3.4 variable tables do
#: NOT list for these specific datasets (VERDICT r2 #9: the registry
#: carried 122 template extras beyond the IG inventory; over-inclusion
#: produces spurious Expected-missing warnings). The generators build
#: from the general observation-class shapes; this table pins each
#: dataset back to the exact IG list (e.g. EC carries EXSTDTC-family
#: timing but no VISIT block; RELSUB has no DOMAIN column).
_IG_TEMPLATE_OVERSHOOT: dict[str, tuple[str, ...]] = {
    "AG": ("AGDOSRGM", "AGDOSTOT"),
    "EC": ("ECDTC", "ECDY", "ECENRF", "ECMODIFY", "ECREASND", "ECSTAT",
           "ECSTRF", "VISIT", "VISITDY", "VISITNUM"),
    "ML": ("MLDOSFRQ", "MLDOSRGM", "MLDOSTOT", "MLENRF", "MLFAST",
           "MLROUTE", "MLSTRF"),
    "PR": ("PRDOSTOT", "PRENRF", "PRMODIFY", "PRREASND", "PRSTAT", "PRSTRF"),
    "SU": ("SUDOSRGM", "VISIT", "VISITDY", "VISITNUM"),
    "BE": ("BELNKGRP", "BELNKID", "EPOCH", "TAETORD"),
    "CE": ("CEBDSYCD", "CEDUR", "CEMODIFY", "VISIT", "VISITDY", "VISITNUM"),
    "DS": ("TAETORD",),
    "DV": ("DVDUR", "DVGRPID", "VISIT", "VISITDY", "VISITNUM"),
    "HO": ("HOENRF", "HOMODIFY", "HOSTRF", "VISIT", "VISITDY", "VISITNUM"),
    "BS": ("BSDRVFL", "EPOCH", "TAETORD"),
    "CP": ("CPFAST", "CPRESCAT", "CPSTNRC", "CPTOX", "CPTOXGR", "CPTSTDTL"),
    "DD": ("DDDRVFL", "DDGRPID", "DDREASND", "DDSPID", "DDSTAT", "EPOCH",
           "TAETORD"),
    "GF": ("EPOCH", "GFSPCCND", "TAETORD"),
    "IS": ("ISLOINC",),
    "MI": ("MIDRVFL",),
    "MS": ("MSLNKGRP", "MSORNRHI", "MSORNRLO", "MSSTNRC", "MSSTNRHI",
           "MSSTNRLO"),
    "OE": ("OEORREF", "OESPID"),
    "PC": ("PCBLFL", "PCEVINTX"),
    "PP": ("PPDRVFL", "PPSPID", "VISIT", "VISITDY", "VISITNUM"),
    "RE": ("RENRIND", "REORNRHI", "REORNRLO", "RESTNRC", "RESTNRHI",
           "RESTNRLO"),
    "RP": ("RPMETHOD",),
    "RS": ("RSLAT", "RSLOC"),
    "SS": ("SSELTM", "SSRFTDTC", "SSTPT", "SSTPTNUM", "SSTPTREF"),
    "TR": ("TRCAT", "TRDIR", "TRDRVFL", "TRLAT", "TRLOC", "TRSCAT"),
    "TU": ("TUCAT", "TUREASND", "TUSCAT", "TUSTAT"),
    "FA": ("FADIR", "FADRVFL", "FAELTM", "FAMETHOD", "FARFTDTC", "FATPT",
           "FATPTNUM", "FATPTREF"),
    "SR": ("SRDIR", "SRDRVFL"),
    "RELSUB": ("DOMAIN",),
}


def _apply_ig_adjustments(out: dict[str, dict]) -> None:
    """Per-domain corrections where the class template over- or
    under-shoots the published IG v3.4 variable set (domain-specific
    qualifiers the general class doesn't carry, and template variables
    the IG deliberately omits for that domain)."""

    def rq(name, label, core="Perm", dt="Char", cl=""):
        return _v(name, label, core, dt, role="Record Qualifier", codelist=cl)

    adds: dict[str, list[dict]] = {
        "LB": [
            rq("LBTSTCND", "Test Condition"),
            rq("LBBDAGNT", "Binding Agent"),
            rq("LBTSTOPO", "Test Operational Objective"),
            _v("LBRESSCL", "Result Scale", "Perm", role="Variable Qualifier"),
            _v("LBRESTYP", "Result Type", "Perm", role="Variable Qualifier"),
            rq("LBCOLSRT", "Collection Sort Order", dt="Num"),
            _v("LBLLOD", "Lower Limit of Detection", "Perm", "Num",
               role="Variable Qualifier"),
            rq("LBSPCUFL", "Specimen Usability Flag", cl=_CL_NY),
            rq("LBANMETH", "Analysis Method"),
            rq("LBTMTHSN", "Method Sensitivity"),
            rq("LBCLSIG", "Clinically Significant, Collected", cl=_CL_NY),
            _dtc("LBENDTC", "End Date/Time of Specimen Collection"),
            _v("LBENDY", "Study Day of End of Specimen Collection", "Perm",
               "Num", role="Timing"),
            rq("LBPTFL", "Point in Time Flag", cl=_CL_NY),
            _v("LBPDUR", "Planned Duration of Collection", "Perm",
               role="Timing", dvd=_DVD_DURATION),
        ],
        "AE": [
            _v("SPDEVID", "Sponsor Device Identifier", "Perm",
               role="Identifier"),
            rq("AEACNDEV", "Action Taken with Device"),
            rq("AERLDEV", "Relationship of AE to Device"),
            rq("AESINTV", "Serious, Intervention Required", cl=_CL_NY),
            rq("AEUNANT", "Unanticipated Adverse Device Effect", cl=_CL_NY),
            rq("AERLPRT", "Relationship of AE to Device Part"),
            rq("AERLPRC", "Relationship of AE to Procedure"),
        ],
        "DM": [
            _dtc("RFCSTDTC", "Date/Time of First Study Collection"),
            _dtc("RFCENDTC", "Date/Time of Last Study Collection"),
        ],
        "EG": [
            _v("SPDEVID", "Sponsor Device Identifier", "Perm",
               role="Identifier"),
            rq("EGBEATNO", "ECG Beat Number", dt="Num"),
            rq("EGXFN", "ECG External File Path"),
            rq("EGLEAD", "Lead Location Used for Measurement"),
            rq("EGEVALID", "Evaluator Identifier"),
            rq("EGCLSIG", "Clinically Significant, Collected", cl=_CL_NY),
            rq("EGREPNUM", "Repetition Number", dt="Num"),
        ],
        "VS": [
            rq("VSCLSIG", "Clinically Significant, Collected", cl=_CL_NY),
        ],
        "CM": [
            rq("CMADJ", "Reason for Dose Adjustment"),
            rq("CMRSDISC", "Reason the Intervention Was Discontinued"),
        ],
        "EX": [
            _v("EXREFID", "Reference ID", "Perm", role="Identifier"),
            _v("EXLNKID", "Link ID", "Perm", role="Identifier"),
            _v("EXLNKGRP", "Link Group ID", "Perm", role="Identifier"),
            _v("EXDIR", "Directionality", "Perm", role="Variable Qualifier",
               codelist=_CL_DIR),
            rq("EXADJ", "Reason for Dose Adjustment"),
            _v("EXTPT", "Planned Time Point Name", "Perm", role="Timing"),
            _v("EXTPTNUM", "Planned Time Point Number", "Perm", "Num",
               role="Timing"),
            _v("EXELTM", "Planned Elapsed Time from Time Point Ref", "Perm",
               role="Timing", dvd=_DVD_DURATION),
            _v("EXTPTREF", "Time Point Reference", "Perm", role="Timing"),
            _dtc("EXRFTDTC", "Date/Time of Reference Time Point"),
        ],
        "PE": [
            _v("PEMODIFY", "Modified Reported Term", "Perm",
               role="Synonym Qualifier"),
            rq("PEBODSYS", "Body System or Organ Class"),
            _v("PEORRESU", "Original Units", "Perm",
               role="Variable Qualifier", codelist=_CL_UNIT),
            rq("PELOBXFL", "Last Observation Before Exposure Flag",
               cl=_CL_NY),
            rq("PEBLFL", "Baseline Flag", cl=_CL_NY),
        ],
        "DA": [
            _v("DALNKID", "Link ID", "Perm", role="Identifier"),
            _v("DALNKGRP", "Link Group ID", "Perm", role="Identifier"),
        ],
        "MH": [
            rq("MHEVDTYP", "Medical History Event Date Type"),
        ],
        "EC": [
            rq("ECMOOD", "Mood"),
            rq("ECREASOC", "Reason for Occur Value"),
            _v("ECDIR", "Directionality", "Perm", role="Variable Qualifier",
               codelist=_CL_DIR),
            _v("ECPORTOT", "Portion or Totality", "Perm",
               role="Variable Qualifier", codelist=_CL_PORTOT),
            rq("ECPSTRG", "Product Strength Amount", dt="Num"),
            _v("ECPSTRGU", "Product Strength Units", "Perm",
               role="Variable Qualifier", codelist=_CL_UNIT),
            rq("ECADJ", "Reason for Dose Adjustment"),
            _v("ECTPT", "Planned Time Point Name", "Perm", role="Timing"),
            _v("ECTPTNUM", "Planned Time Point Number", "Perm", "Num",
               role="Timing"),
        ],
        "ML": [
            _dtc("MLDTC", "Date/Time of Intake"),
            _v("MLDY", "Study Day of Intake", "Perm", "Num", role="Timing"),
            _v("MLTPT", "Planned Time Point Name", "Perm", role="Timing"),
            _v("MLTPTNUM", "Planned Time Point Number", "Perm", "Num",
               role="Timing"),
            _v("MLELTM", "Planned Elapsed Time from Time Point Ref", "Perm",
               role="Timing", dvd=_DVD_DURATION),
            _v("MLTPTREF", "Time Point Reference", "Perm", role="Timing"),
            _dtc("MLRFTDTC", "Date/Time of Reference Time Point"),
            _v("MIDS", "Disease Milestone Instance Name", "Perm",
               role="Timing"),
            _v("RELMIDS", "Temporal Relation to Milestone Instance", "Perm",
               role="Timing"),
            _dtc("MIDSDTC", "Disease Milestone Instance Date/Time"),
        ],
        "BE": [
            _v("SPDEVID", "Sponsor Device Identifier", "Perm",
               role="Identifier"),
            _v("BEMODIFY", "Modified Reported Term", "Perm",
               role="Synonym Qualifier"),
            rq("BELOC", "Location of Biospecimen Collection", cl=_CL_LOC),
            rq("BEPARTY", "Accountable Party"),
            rq("BEPRTYID", "Identification of Accountable Party"),
            _dtc("BEDTC", "Date/Time of Collection"),
        ],
        "PP": [
            rq("PPSPEC", "Specimen Material Type", cl="C78734"),
            rq("PPANMETH", "Analysis Method"),
            _v("PPTPTREF", "Time Point Reference", "Perm", role="Timing"),
            _dtc("PPRFTDTC", "Date/Time of Reference Point"),
            _v("PPSTINT", "Planned Start of Assessment Interval", "Perm",
               role="Timing", dvd=_DVD_DURATION),
            _v("PPENINT", "Planned End of Assessment Interval", "Perm",
               role="Timing", dvd=_DVD_DURATION),
        ],
        "RS": [
            _v("RSSTRTPT", "Start Relative to Reference Time Point", "Perm",
               role="Timing", codelist=_CL_STENRF),
            _dtc("RSSTTPT", "Start Reference Time Point"),
            _v("RSENRTPT", "End Relative to Reference Time Point", "Perm",
               role="Timing", codelist=_CL_STENRF),
            _dtc("RSENTPT", "End Reference Time Point"),
        ],
        "MS": [
            rq("MSAGENT", "Agent Name"),
            rq("MSCONC", "Agent Concentration", dt="Num"),
            _v("MSCONCU", "Agent Concentration Units", "Perm",
               role="Variable Qualifier", codelist=_CL_UNIT),
            rq("MSANMETH", "Analysis Method"),
        ],
        "GF": [
            rq("GFORREF", "Result Reference in Original Format"),
            rq("GFSTREFC", "Reference Result in Character Format"),
            rq("GFSTREFN", "Numeric Reference Result in Std Format",
               dt="Num"),
            rq("GFINHERT", "Inherited From"),
            rq("GFGENREF", "Genomic Reference Assembly"),
            rq("GFCHROM", "Chromosome Identifier"),
        ],
        "IS": [
            rq("ISTSTCND", "Test Condition"),
            rq("ISCNDAGT", "Condition Agent"),
            rq("ISBDAGNT", "Binding Agent"),
            rq("ISTSTOPO", "Test Operational Objective"),
            rq("ISMSCBCE", "Microbial Source"),
            rq("ISSPCUFL", "Specimen Usability Flag", cl=_CL_NY),
            _v("ISLLOQ", "Lower Limit of Quantitation", "Perm", "Num",
               role="Variable Qualifier"),
            _dtc("ISENDTC", "End Date/Time of Specimen Collection"),
            _v("ISENDY", "Study Day of End of Specimen Collection", "Perm",
               "Num", role="Timing"),
        ],
        "OE": [
            rq("OEORREF", "Result Reference in Original Format"),
        ],
        "RE": [
            rq("REORREF", "Result Reference in Original Format"),
            rq("RESTREFC", "Reference Result in Character Format"),
            rq("RESTREFN", "Numeric Reference Result in Std Format",
               dt="Num"),
        ],
        "CP": [
            rq("CPSBMRKS", "Submitted Marker String"),
            rq("CPCELSTA", "Cell State"),
            rq("CPCSMRKS", "Cell State Marker String"),
            rq("CPTSTCND", "Test Condition"),
            rq("CPCNDAGT", "Condition Agent"),
            rq("CPBDAGNT", "Binding Agent"),
            rq("CPABCLID", "Antibody Clone Identifier"),
            rq("CPMRKSTR", "Marker String"),
            rq("CPGATE", "Gate"),
            rq("CPGATDEF", "Gate Definition"),
        ],
        "GF": [
            rq("GFSYM", "Gene Symbol"),
            rq("GFSYMTYP", "Gene Symbol Type"),
            rq("GFGENLOC", "Genetic Location"),
            rq("GFGENSR", "Genetic Sub-region"),
            rq("GFSEQID", "Sequence Identifier"),
            rq("GFPVRID", "Programmatic Variant Record Identifier"),
            rq("GFCOPYID", "Copy Identifier"),
            rq("GFXFN", "External File Path"),
            rq("GFRUNID", "Run ID"),
            rq("GFANMETH", "Analysis Method"),
        ],
        "MS": [
            rq("MSLOBXFL", "Last Observation Before Exposure Flag",
               cl=_CL_NY),
            rq("MSFAST", "Fasting Status", cl=_CL_NY),
            _v("MSEVAL", "Evaluator", "Perm", role="Record Qualifier",
               codelist=_CL_EVAL),
            _v("MSEVALID", "Evaluator Identifier", "Perm",
               role="Variable Qualifier"),
            rq("MSACPTFL", "Accepted Record Flag", cl=_CL_NY),
            _v("MSLLOQ", "Lower Limit of Quantitation", "Perm", "Num",
               role="Variable Qualifier"),
            _v("MSULOQ", "Upper Limit of Quantitation", "Perm", "Num",
               role="Variable Qualifier"),
            rq("MSREPNUM", "Repetition Number", dt="Num"),
            _v("MSDUR", "Duration", "Perm", role="Timing",
               dvd=_DVD_DURATION),
            _v("MSEVLINT", "Evaluation Interval", "Perm", role="Timing",
               dvd=_DVD_DURATION),
        ],
        "PR": [
            _v("PRDIR", "Directionality", "Perm", role="Variable Qualifier",
               codelist=_CL_DIR),
            _v("PRPORTOT", "Portion or Totality", "Perm",
               role="Variable Qualifier", codelist=_CL_PORTOT),
            _v("PRTPT", "Planned Time Point Name", "Perm", role="Timing"),
            _v("PRTPTNUM", "Planned Time Point Number", "Perm", "Num",
               role="Timing"),
            _v("PRELTM", "Planned Elapsed Time from Time Point Ref", "Perm",
               role="Timing", dvd=_DVD_DURATION),
            _v("PRTPTREF", "Time Point Reference", "Perm", role="Timing"),
            _dtc("PRRFTDTC", "Date/Time of Reference Time Point"),
        ],
        "PC": [
            _v("PCLLOQ", "Lower Limit of Quantitation", "Perm", "Num",
               role="Variable Qualifier"),
            _v("PCULOQ", "Upper Limit of Quantitation", "Perm", "Num",
               role="Variable Qualifier"),
            _dtc("PCENDTC", "End Date/Time of Specimen Collection"),
            _v("PCENDY", "Study Day of End of Specimen Collection", "Perm",
               "Num", role="Timing"),
        ],
        "RP": [
            _v("RPREFID", "Reference ID", "Perm", role="Identifier"),
            _v("RPLNKID", "Link ID", "Perm", role="Identifier"),
            _v("RPLNKGRP", "Link Group ID", "Perm", role="Identifier"),
            _v("RPDUR", "Duration", "Perm", role="Timing",
               dvd=_DVD_DURATION),
        ],
        "TR": [
            rq("TRNAM", "Vendor Name"),
            rq("TRLOBXFL", "Last Observation Before Exposure Flag",
               cl=_CL_NY),
            _v("TREVALID", "Evaluator Identifier", "Perm",
               role="Variable Qualifier"),
            rq("TRACPTFL", "Accepted Record Flag", cl=_CL_NY),
        ],
        "EC": None,  # placeholder replaced below (merge with earlier EC adds)
        "CE": [
            rq("CETOXGR", "Standard Toxicity Grade", cl=_CL_TOXGR),
            _dtc("CEDTC", "Date/Time of Event Collection"),
            _v("CEDY", "Study Day of Event Collection", "Perm", "Num",
               role="Timing"),
        ],
        "MI": [
            _v("MITSTDTL", "Measurement, Test or Examination Detail", "Perm",
               role="Topic"),
            _v("MIRESCAT", "Result Category", "Perm",
               role="Variable Qualifier"),
            rq("MILOBXFL", "Last Observation Before Exposure Flag",
               cl=_CL_NY),
        ],
        "SR": [
            _v("SRREFID", "Reference ID", "Perm", role="Identifier"),
            rq("SRNAM", "Vendor Name"),
            rq("SRSPEC", "Specimen Type", cl="C78734"),
        ],
    }
    # merge the second EC batch into the first
    adds["EC"] = [
        rq("ECMOOD", "Mood"),
        rq("ECREASOC", "Reason for Occur Value"),
        _v("ECDIR", "Directionality", "Perm", role="Variable Qualifier",
           codelist=_CL_DIR),
        _v("ECPORTOT", "Portion or Totality", "Perm",
           role="Variable Qualifier", codelist=_CL_PORTOT),
        rq("ECPSTRG", "Product Strength Amount", dt="Num"),
        _v("ECPSTRGU", "Product Strength Units", "Perm",
           role="Variable Qualifier", codelist=_CL_UNIT),
        rq("ECADJ", "Reason for Dose Adjustment"),
        _v("ECTPT", "Planned Time Point Name", "Perm", role="Timing"),
        _v("ECTPTNUM", "Planned Time Point Number", "Perm", "Num",
           role="Timing"),
        _v("ECELTM", "Planned Elapsed Time from Time Point Ref", "Perm",
           role="Timing", dvd=_DVD_DURATION),
        _v("ECTPTREF", "Time Point Reference", "Perm", role="Timing"),
        _dtc("ECRFTDTC", "Date/Time of Reference Time Point"),
    ]
    adds["GF"] += [
        rq("GFORREF", "Result Reference in Original Format"),
        rq("GFSTREFC", "Reference Result in Character Format"),
        rq("GFSTREFN", "Numeric Reference Result in Std Format", dt="Num"),
        rq("GFINHERT", "Inherited From"),
        rq("GFGENREF", "Genomic Reference Assembly"),
        rq("GFCHROM", "Chromosome Identifier"),
        _v("GFLLOQ", "Lower Limit of Quantitation", "Perm", "Num",
           role="Variable Qualifier"),
        rq("GFREPNUM", "Repetition Number", dt="Num"),
    ]
    adds["MS"] += [
        rq("MSAGENT", "Agent Name"),
        rq("MSCONC", "Agent Concentration", dt="Num"),
        _v("MSCONCU", "Agent Concentration Units", "Perm",
           role="Variable Qualifier", codelist=_CL_UNIT),
        rq("MSANMETH", "Analysis Method"),
        _v("MSEVINTX", "Evaluation Interval Text", "Perm", role="Timing"),
    ]
    adds["HO"] = [
        _dtc("HODTC", "Date/Time of Event Collection"),
        _v("HODY", "Study Day of Event Collection", "Perm", "Num",
           role="Timing"),
    ]
    adds["BS"] = [
        _v("SPDEVID", "Sponsor Device Identifier", "Perm", role="Identifier"),
        rq("BSANTREG", "Anatomical Region"),
    ]
    adds["CP"] += [
        rq("CPSPTSTD", "Specimen Test Condition"),
        rq("CPTSTPNL", "Test Panel"),
        _v("CPRESSCL", "Result Scale", "Perm", role="Variable Qualifier"),
        _v("CPRESTYP", "Result Type", "Perm", role="Variable Qualifier"),
        rq("CPCOLSRT", "Collection Sort Order", dt="Num"),
        rq("CPANMETH", "Analysis Method"),
        rq("CPCLSIG", "Clinically Significant, Collected", cl=_CL_NY),
    ]
    adds["SV"] = [
        rq("SVCNTMOD", "Contact Mode"),
        rq("SVEPCHGI", "Epoch Change Indication"),
    ]
    adds["AE"] += [
        _v("AEENRF", "End Relative to Reference Period", "Perm",
           role="Timing", codelist=_CL_STENRF),
    ]
    adds["DD"] = [
        _v("DDRESCAT", "Result Category", "Perm", role="Variable Qualifier"),
    ]
    adds["CO"] = [
        _v("COEVALID", "Evaluator Identifier", "Perm",
           role="Variable Qualifier"),
    ]
    adds["RELSUB"] = [
        _v("POOLID", "Pool Identifier", "Perm", role="Identifier"),
    ]
    removes: dict[str, set[str]] = {
        # template features the published IG omits for these domains
        "AE": {"AEOCCUR", "AESTRTPT", "AESTTPT"},
        "VS": {"VSORNRLO", "VSORNRHI", "VSSTNRLO", "VSSTNRHI", "VSSTNRC",
               "VSNRIND"},
        "EX": {"EXDOSTOT", "EXENRF", "EXOCCUR", "EXPRESP", "EXREASND",
               "EXSTAT", "EXSTRF", "VISIT", "VISITDY", "VISITNUM"},
        "PE": {"PEDIR"},
        "DA": {"DABLFL", "DADRVFL"},
        "MH": {"MHBDSYCD", "MHDUR", "MHENDY", "MHSTDY", "MHSTRF",
               "MHSTRTPT", "MHSTTPT", "VISIT", "VISITDY", "VISITNUM"},
        "DS": {"DSENDTC", "DSENDY"},
        "IE": {"IEGRPID"},
    }
    # VS carries toxicity but not normal ranges in the published IG
    adds["VS"] += [
        _v("VSTOX", "Toxicity", "Perm", role="Variable Qualifier"),
        _v("VSTOXGR", "Standard Toxicity Grade", "Perm",
           role="Variable Qualifier", codelist=_CL_TOXGR),
    ]
    anchors = {"DM": "RFPENDTC"}  # insert after this variable instead
    for code, extra in adds.items():
        vs = out[code]["variables"]
        if code in anchors:
            ix = next(
                i + 1 for i, v in enumerate(vs) if v["name"] == anchors[code]
            )
        else:
            # insert domain qualifiers before the timing block
            ix = next(
                (i for i, v in enumerate(vs) if v["role"] == "Timing"), len(vs)
            )
        vs[ix:ix] = extra
    for code, names in removes.items():
        out[code]["variables"] = [
            v for v in out[code]["variables"] if v["name"] not in names
        ]


DOMAINS: dict[str, dict] = _build_domains()

# attach orders (IG variable order = list position)
for _dom in DOMAINS.values():
    for _i, _var in enumerate(_dom["variables"]):
        _var["order"] = _i + 1


def get_domain(code: str) -> dict:
    return DOMAINS[code.upper()]


#: Domains the SDTM-IG allows to be physically split into multiple
#: datasets (reference: export/types.rs:56-68 — LBCH, FAAE, ...).
SPLITTABLE_DOMAINS = ("LB", "FA", "QS", "VS", "EG", "PC", "PP")


def base_domain_code(dataset_name: str) -> str:
    """Parent domain code for a (possibly split) dataset name.

    ``LBCC``/``FAAE`` → 2-letter base when the prefix is a splittable
    domain (reference export/types.rs:56-68); additionally
    ``LB_PREG``/``DS_EOT``/``QS_PGA`` → the token before the first
    underscore when that token is a registered domain (the reference's
    own mockdata names split files this way). A plain registered code
    or an unrecognized name returns itself.
    """
    up = dataset_name.upper()
    if up in DOMAINS:
        return up
    head = up.split("_", 1)[0]
    if head in DOMAINS:
        return head
    if len(up) > 2 and up[:2] in SPLITTABLE_DOMAINS:
        return up[:2]
    return up


def supp_domain_for(rdomain: str) -> dict:
    """SUPP-- definition derived from the SUPPQUAL template
    (reference: sdtm/domain.rs:220-228)."""
    base = DOMAINS["SUPPQUAL"]
    return {
        "label": f"Supplemental Qualifiers for {rdomain.upper()}",
        "class": base["class"],
        "structure": base["structure"],
        "variables": [dict(v) for v in base["variables"]],
    }


REGISTRY_CSV_COLUMNS = (
    "domain,name,label,core,data_type,role,codelist_code,length,order,"
    "described_value_domain"
)


def dump_registry_csv() -> str:
    """Serialize the registry in the Variables.csv shape a production
    deployment would ship (and `load_registry_csv` reads back)."""
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(REGISTRY_CSV_COLUMNS.split(","))
    for code, d in DOMAINS.items():
        for v in d["variables"]:
            w.writerow(
                [code, v["name"], v["label"], v["core"], v["data_type"],
                 v["role"], v["codelist_code"], v["length"] or "", v["order"],
                 v.get("described_value_domain", "")]
            )
    return buf.getvalue()


def load_registry_csv(text: str) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    for row in csv.DictReader(io.StringIO(text)):
        out.setdefault(row["domain"], []).append(
            {
                "name": row["name"],
                "label": row["label"],
                "core": row["core"],
                "data_type": row["data_type"],
                "role": row["role"],
                "codelist_code": row["codelist_code"],
                "length": int(row["length"]) if row["length"] else None,
                "order": int(row["order"]),
                "described_value_domain": row.get("described_value_domain", ""),
            }
        )
    return out
