from olap_project_spark.transforms.clean import clean  # noqa: F401
from olap_project_spark.transforms.route import route  # noqa: F401
