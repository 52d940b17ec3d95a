"""lens_spark — a PySpark-native analytics/transform engine.

A brand-new engine with the query and data-processing capabilities of
the reference lens engine (sourcenetwork/lens): ordered, lazily
evaluated, bidirectional (invertible) pipelines of parameterized
transforms over semi-structured rows, plus a content-addressed pipeline
registry — re-expressed Spark-first on the DataFrame API so Catalyst /
Tungsten provide optimization, fusion, and distributed execution.

Reference parity map (file:line citations are into /root/reference):

- pipeline model  -> lens_spark.model        (host-go/config/model/lens.go:11-30)
- compose/append  -> lens_spark.engine       (host-go/engine/engine.go:25-49)
- inversion       -> lens_spark.engine.invert (host-go/repository/repository.go:172-206)
- built-in lenses -> lens_spark.operators    (tests/modules/* archetypes M1-M7)
- registry/store  -> lens_spark.registry     (host-go/store/store.go:29-59)
- CLI             -> lens_spark.cli          (host-go/cli/main.go)
- LLM-pipeline extensions (dedup / similarity / text / multimodal)
                  -> lens_spark.functions, lens_spark.operators
"""

from lens_spark.model import LensConfig, LensModule
from lens_spark.engine import append, invert, transform
from lens_spark.errors import LensError
from lens_spark.registry import Registry

__version__ = "0.1.0"

__all__ = [
    "LensConfig",
    "LensModule",
    "LensError",
    "Registry",
    "append",
    "invert",
    "transform",
]
