from quickstep_tpu.catalog.catalog import (  # noqa: F401
    Catalog,
    CatalogDatabase,
    CatalogRelation,
    CatalogAttribute,
    CatalogRelationStatistics,
    PartitionScheme,
)
