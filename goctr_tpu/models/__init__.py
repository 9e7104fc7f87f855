from goctr_tpu.models.base import SampleInfo, TrainSample, split_blocks
from goctr_tpu.models.din import DIN
from goctr_tpu.models.youtube_dnn import YoutubeDNN
from goctr_tpu.models.mlp_tower import MLPTower
from goctr_tpu.models.trainer import TrainedRanker, train_ranker
