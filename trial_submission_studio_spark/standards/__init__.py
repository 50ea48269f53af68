from trial_submission_studio_spark.standards.ct import (  # noqa: F401
    Codelist,
    Term,
    codelist_lookup_df,
    load_ct_csv,
)
from trial_submission_studio_spark.standards.ct_catalog import (  # noqa: F401
    SHIPPED_CT_VERSIONS,
    TerminologyRegistry,
    builtin_ct_versions,
    builtin_lookup_df,
    builtin_registry,
    full_lookup_df,
    full_registry,
    load_shipped_ct,
    registry_coverage,
)
