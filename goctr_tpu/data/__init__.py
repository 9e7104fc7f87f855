from goctr_tpu.data.schema import (Column, MysqlScanner, SqliteScanner,
                                   TableScanner, parse_mysql_ddl)
from goctr_tpu.data.fixture import generate_movielens_fixture
from goctr_tpu.data.movielens import MovielensRec
