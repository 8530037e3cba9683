"""Test-split inference from a saved checkpoint.

Reference method/eval.py start_inference (eval.py:285-322): restore the
run's opt.json, rebuild the model from the saved model_cfg, embed the test
corpus and report retrieval metrics.

Run: python -m dldkd_tpu.infer --model_dir <results_dir> \
        --root_path $root --collection tvr --visual_feature i3d_resnet
"""

from __future__ import annotations

import jax

from dldkd_tpu import checkpoint as ckpt_lib
from dldkd_tpu.config import Config, parse_args
from dldkd_tpu.data import BigFile, pack_query_set, pack_video_corpus, read_dict
from dldkd_tpu.data.ingest import dataset_paths, read_video_ids
from dldkd_tpu.evaluate import eval_retrieval
from dldkd_tpu.models import DLDKD
from dldkd_tpu.train import init_params
from dldkd_tpu.utils import setup_logging


def start_inference(cfg: Config, split: str = "test"):
    logger = setup_logging(cfg.results_dir or None)
    if cfg.model.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          cfg.model.matmul_precision)
    model_dir = cfg.eval.model_dir or cfg.results_dir
    ckpt_dir = f"{model_dir}/ckpt"
    mcfg = ckpt_lib.load_model_cfg(ckpt_dir)
    model = DLDKD(config=mcfg)
    template = init_params(model, mcfg, 0)
    params, epoch = ckpt_lib.restore_params_only(ckpt_dir, template)
    logger.info("restored checkpoint from epoch %d", epoch)

    paths = dataset_paths(cfg.data.root_path, cfg.data.collection,
                          cfg.data.visual_feature)
    if cfg.data.pack_cache:
        from dldkd_tpu.data import cache as pack_cache

        videos = pack_cache.cached_corpus_pack(paths, split, mcfg.max_ctx_l)
        queries = pack_cache.cached_query_pack(paths, split, mcfg.max_desc_l)
    else:
        visual_feats = BigFile(paths["visual_feat_dir"])
        video2frames = read_dict(paths["video2frames"])
        videos = pack_video_corpus(
            read_video_ids(paths["cap_file"][split]), visual_feats,
            video2frames, max_ctx_l=mcfg.max_ctx_l)
        queries = pack_query_set(paths["cap_file"][split],
                                 paths["text_feat"],
                                 max_desc_l=mcfg.max_desc_l)

    # engine routing (auto streaming on over-budget corpora, streaming x
    # sharding composition on a slice) is run_retrieval_eval's job — the
    # train-time val eval routes through the same helper
    from dldkd_tpu.evaluate import run_retrieval_eval

    mesh = None
    if jax.device_count() > 1:
        # corpus-sharded eval over the whole slice (leaving n-1 chips
        # idle here would waste the mesh)
        from dldkd_tpu.parallel import make_mesh

        mesh = make_mesh(jax.device_count())
    metrics = run_retrieval_eval(model, params, videos, queries, cfg.eval,
                                 mesh=mesh)
    lines = []
    for branch, m in metrics.items():
        line = ("{} {}: r_1_5_10_100 [{:.1f}, {:.1f}, {:.1f}, {:.1f}] | "
                "recall sum {:.1f} | mAP {:.4f}".format(
                    split, branch, m["r1"], m["r5"], m["r10"], m["r100"],
                    m["sumr"], m["map"]))
        logger.info("%s", line)
        lines.append(line)
    # append-only eval log in the run dir (reference eval.py writes its
    # metrics into the model_dir as well)
    try:
        import time as _time

        with open(f"{model_dir}/eval.log.txt", "a") as f:
            f.write(_time.strftime("%Y_%m_%d_%H_%M_%S") + "\n"
                    + "\n".join(lines) + "\n")
    except OSError:
        pass
    return metrics


def main(argv=None):
    cfg = parse_args(argv, test=True, finalize=False)
    start_inference(cfg)


if __name__ == "__main__":
    main()
