import json, tempfile, os, urllib.request

import jax
print("devices:", jax.devices())

from goctr_tpu.core.runtime import enable_compilation_cache
enable_compilation_cache()

# new surface: pure DDL parser
from goctr_tpu.data import parse_mysql_ddl, SqliteScanner, generate_movielens_fixture, MovielensRec
t, cols = parse_mysql_ddl("CREATE TABLE `t` (`a` int(11) NOT NULL, `b` varchar(8), PRIMARY KEY (`a`))")
assert t == "t" and cols[0].primary_key and cols[1].type == "varchar", (t, cols)
print("parse_mysql_ddl OK:", t, [c.name for c in cols])

# end-to-end library flow on the TPU (small fixture to keep host work light)
db = os.path.join(tempfile.mkdtemp(), "ml.db")
generate_movielens_fixture(db, n_users=120, n_items=200, n_ratings=6000, seed=0)
s = SqliteScanner(db)
print("tables:", sorted(s.tables())[:4], "...")

from goctr_tpu.recommend import Context, Train, RankerFitter, Rank
rec = MovielensRec(db)
fitter = RankerFitter(model_name="mlp", hidden=(32,), epochs=4, batch_size=512, activation="relu")
predictor = Train(Context(), rec, fitter)

from goctr_tpu.core.metrics import roc_auc_score, gauc
import numpy as np
scores = Rank(Context(), predictor, user_id=3, item_ids=[1, 2, 5, 9])
print("rank scores:", [(sc.item_id, round(sc.score, 4)) for sc in scores])
assert len(scores) == 4 and all(0.0 <= sc.score <= 1.0 for sc in scores)

# serving surface
from goctr_tpu.serve import start_http_api
srv = start_http_api(predictor, port=18811, background=True)
body = json.dumps({"userId": 3, "itemIdList": [1, 2, 5]}).encode()
req = urllib.request.Request("http://127.0.0.1:18811/api/v1/recommend", data=body,
                             headers={"Content-Type": "application/json"})
resp = json.loads(urllib.request.urlopen(req, timeout=30).read())
print("serve:", resp)
assert len(resp["itemScoreList"]) == 3
ov = json.loads(urllib.request.urlopen("http://127.0.0.1:18811/service/overview", timeout=30).read())
print("overview:", ov)
srv.stop()
print("VERIFY_OK")
