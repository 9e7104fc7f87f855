from goctr_tpu.data.schema import Column, SqliteScanner, TableScanner
from goctr_tpu.data.fixture import generate_movielens_fixture
from goctr_tpu.data.movielens import MovielensRec
