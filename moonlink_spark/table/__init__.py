from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.manifest import Manifest, ManifestStore
from moonlink_spark.table.table import MoonlinkTable

__all__ = ["IdentityProp", "Manifest", "ManifestStore", "MoonlinkTable"]
