import pytest

from azure_medicine_data_engineering_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        "amde-tests",
        master="local[4]",
        conf={"spark.sql.shuffle.partitions": "4", "spark.ui.enabled": "false"},
    )
    yield spark
    spark.stop()
