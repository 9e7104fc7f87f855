from goctr_tpu.serve.api import RecApiServer, start_http_api
