"""ADaM-IG v1.3 structure registry — the reference's second standards
surface (tss-standards/src/adam_ig.rs + data/adam/ig/v1.3).

ADaM defines *structures*, not domains: ADSL (one row per subject),
BDS (one row per subject/parameter/analysis visit) and OCCDS
(occurrence analysis, ADAE-shaped). Hand-written from public ADaM-IG
v1.3 knowledge in the same dict shape as
:mod:`~trial_submission_studio_spark.standards.sdtm_domains`, so the
plan compiler, validator and Define-XML writer consume ADaM datasets
unchanged (``registry=`` parameter of ``create_study``).

ADaM temporal variables are numeric SAS dates (*DT/*DTM/*TM) with
imputation-flag partners (*DTF/*TMF) — unlike SDTM's ISO strings.
Note the name-pattern inference tier (``infer_rules``) still treats a
``*DT`` suffix as an ISO date (the ladder preserves numerics-as-text
unchanged); pipelines deriving true numeric SAS dates supply explicit
``numeric`` rules for them, as sponsors do in practice.
"""

from __future__ import annotations

from trial_submission_studio_spark.standards.sdtm_domains import _v


def _ident_block() -> list[dict]:
    return [
        _v("STUDYID", "Study Identifier", "Req", role="Identifier"),
        _v("USUBJID", "Unique Subject Identifier", "Req", role="Identifier"),
        _v("SUBJID", "Subject Identifier for the Study", "Req", role="Identifier"),
        _v("SITEID", "Study Site Identifier", "Req", role="Identifier"),
    ]


def _adsl_vars() -> list[dict]:
    return _ident_block() + [
        _v("AGE", "Age", "Req", "Num"),
        _v("AGEU", "Age Units", "Req", codelist="C66781"),
        _v("AGEGR1", "Pooled Age Group 1", "Perm"),
        _v("SEX", "Sex", "Req", codelist="C66731"),
        _v("RACE", "Race", "Req", codelist="C74457"),
        _v("ETHNIC", "Ethnicity", "Perm", codelist="C66790"),
        _v("COUNTRY", "Country", "Perm"),
        _v("ARM", "Description of Planned Arm", "Req"),
        _v("ACTARM", "Description of Actual Arm", "Perm"),
        _v("TRT01P", "Planned Treatment for Period 01", "Req"),
        _v("TRT01A", "Actual Treatment for Period 01", "Exp"),
        _v("TRTSDT", "Date of First Exposure to Treatment", "Exp", "Num"),
        _v("TRTSDTM", "Datetime of First Exposure to Treatment", "Perm", "Num"),
        _v("TRTEDT", "Date of Last Exposure to Treatment", "Exp", "Num"),
        _v("TRTEDTM", "Datetime of Last Exposure to Treatment", "Perm", "Num"),
        _v("TRTDURD", "Total Treatment Duration (Days)", "Perm", "Num"),
        _v("RANDDT", "Date of Randomization", "Perm", "Num"),
        _v("RANDFL", "Randomized Population Flag", "Perm", codelist="C66742"),
        _v("SAFFL", "Safety Population Flag", "Exp", codelist="C66742"),
        _v("ITTFL", "Intent-To-Treat Population Flag", "Perm", codelist="C66742"),
        _v("FASFL", "Full Analysis Set Population Flag", "Perm", codelist="C66742"),
        _v("PPROTFL", "Per-Protocol Population Flag", "Perm", codelist="C66742"),
        _v("COMPLFL", "Completers Population Flag", "Perm", codelist="C66742"),
        _v("EOSSTT", "End of Study Status", "Exp"),
        _v("EOSDT", "End of Study Date", "Perm", "Num"),
        _v("DCSREAS", "Reason for Discontinuation from Study", "Exp",
           codelist="C66727"),
        _v("DTHDT", "Date of Death", "Exp", "Num"),
        _v("DTHFL", "Subject Death Flag", "Exp", codelist="C66742"),
        _v("DTHCAUS", "Cause of Death", "Perm"),
        _v("LSTALVDT", "Date Last Known Alive", "Perm", "Num"),
        _v("RFICDT", "Date of Informed Consent", "Perm", "Num"),
    ]


def _bds_vars() -> list[dict]:
    return _ident_block()[:2] + [
        _v("PARAM", "Parameter", "Req", role="Topic"),
        _v("PARAMCD", "Parameter Code", "Req", role="Topic", length=8),
        _v("PARAMN", "Parameter (N)", "Perm", "Num"),
        _v("PARCAT1", "Parameter Category 1", "Perm",
           role="Grouping Qualifier"),
        _v("AVAL", "Analysis Value", "Exp", "Num", role="Result Qualifier"),
        _v("AVALC", "Analysis Value (C)", "Perm", role="Result Qualifier"),
        _v("BASE", "Baseline Value", "Exp", "Num"),
        _v("BASEC", "Baseline Value (C)", "Perm"),
        _v("BASETYPE", "Baseline Type", "Perm"),
        _v("ABLFL", "Baseline Record Flag", "Exp", codelist="C66742"),
        _v("CHG", "Change from Baseline", "Perm", "Num"),
        _v("PCHG", "Percent Change from Baseline", "Perm", "Num"),
        _v("ANRLO", "Analysis Normal Range Lower Limit", "Perm", "Num"),
        _v("ANRHI", "Analysis Normal Range Upper Limit", "Perm", "Num"),
        _v("ANRIND", "Analysis Reference Range Indicator", "Perm",
           codelist="C78736"),
        _v("BNRIND", "Baseline Reference Range Indicator", "Perm",
           codelist="C78736"),
        _v("SHIFT1", "Shift 1", "Perm"),
        _v("DTYPE", "Derivation Type", "Perm"),
        _v("AVISIT", "Analysis Visit", "Exp", role="Timing"),
        _v("AVISITN", "Analysis Visit (N)", "Perm", "Num", role="Timing"),
        _v("ATPT", "Analysis Timepoint", "Perm", role="Timing"),
        _v("ATPTN", "Analysis Timepoint (N)", "Perm", "Num", role="Timing"),
        _v("ADT", "Analysis Date", "Exp", "Num", role="Timing"),
        _v("ADTM", "Analysis Datetime", "Perm", "Num", role="Timing"),
        _v("ADY", "Analysis Relative Day", "Perm", "Num", role="Timing"),
        _v("ADTF", "Analysis Date Imputation Flag", "Perm"),
        _v("ASEQ", "Analysis Sequence Number", "Perm", "Num",
           role="Identifier"),
        _v("TRTP", "Planned Treatment", "Req"),
        _v("TRTA", "Actual Treatment", "Perm"),
        _v("APERIOD", "Period", "Perm", "Num", role="Timing"),
        _v("CRIT1", "Analysis Criterion 1", "Perm"),
        _v("CRIT1FL", "Criterion 1 Evaluation Result Flag", "Perm",
           codelist="C66742"),
        _v("ANL01FL", "Analysis Flag 01", "Perm", codelist="C66742"),
    ]


def _occds_vars() -> list[dict]:
    return _ident_block()[:2] + [
        _v("AEDECOD", "Dictionary-Derived Term", "Req", role="Topic"),
        _v("AEBODSYS", "Body System or Organ Class", "Exp"),
        _v("AESEV", "Severity/Intensity", "Perm", codelist="C66769"),
        _v("AESER", "Serious Event", "Exp", codelist="C66742"),
        _v("AREL", "Analysis Causality", "Perm"),
        _v("AESEQ", "Sequence Number", "Exp", "Num", role="Identifier"),
        _v("TRTP", "Planned Treatment", "Req"),
        _v("TRTA", "Actual Treatment", "Exp"),
        _v("TRTEMFL", "Treatment Emergent Analysis Flag", "Exp",
           codelist="C66742"),
        _v("ASTDT", "Analysis Start Date", "Exp", "Num", role="Timing"),
        _v("ASTDY", "Analysis Start Relative Day", "Perm", "Num",
           role="Timing"),
        _v("AENDT", "Analysis End Date", "Perm", "Num", role="Timing"),
        _v("AENDY", "Analysis End Relative Day", "Perm", "Num", role="Timing"),
        _v("ADURN", "Analysis Duration (N)", "Perm", "Num"),
        _v("ADURU", "Analysis Duration Units", "Perm", codelist="C71620"),
        _v("APERIOD", "Period", "Perm", "Num", role="Timing"),
        _v("ANL01FL", "Analysis Flag 01", "Perm", codelist="C66742"),
    ]


ADAM_STRUCTURES: dict[str, dict] = {
    "ADSL": {
        "label": "Subject-Level Analysis Dataset",
        "class": "Subject Level Analysis Dataset",
        "structure": "One record per subject",
        "variables": _adsl_vars(),
    },
    "BDS": {
        "label": "Basic Data Structure",
        "class": "Basic Data Structure",
        "structure": "One record per subject per parameter per analysis "
                     "visit per analysis timepoint",
        "variables": _bds_vars(),
    },
    "OCCDS": {
        "label": "Occurrence Data Structure",
        "class": "Occurrence Data Structure",
        "structure": "One record per subject per occurrence",
        "variables": _occds_vars(),
    },
}

for _d in ADAM_STRUCTURES.values():
    for _i, _var in enumerate(_d["variables"]):
        _var["order"] = _i + 1


def adam_dataset(name: str, structure: str = "BDS") -> dict:
    """A concrete ADaM dataset (e.g. ADLB) from its structure template
    (reference builds ADaM datasets the same way: structure + sponsor
    parameters)."""
    base = ADAM_STRUCTURES[structure.upper()]
    return {
        "label": name.upper(),
        "class": base["class"],
        "structure": base["structure"],
        "variables": [dict(v) for v in base["variables"]],
    }
