"""Worker for the 2-process multi-host smoke test (run by test_multihost.py).

Each process owns ONE virtual CPU device; ``jax.distributed.initialize``
builds the 2-device global mesh over both, and one real Trainer runs a
training epoch + evaluation with the batch sharded across processes —
the DCN-connected-slices path of SURVEY.md §5 exercised end to end.

Usage: python multihost_worker.py <pid> <nproc> <coordinator> <workdir>
"""

import json
import os
import sys
import time


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, workdir = sys.argv[3], sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator, nproc, pid)
    assert jax.device_count() == nproc, jax.devices()
    assert jax.local_device_count() == 1

    sys.path.insert(0, os.path.dirname(__file__))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    from corpus_utils import build_corpus_with_metafiles, tiny_model_hp

    from multilingual_text_to_speech_tpu.data import TextToSpeechDatasetCollection
    from multilingual_text_to_speech_tpu.parallel import make_mesh
    from multilingual_text_to_speech_tpu.training import Trainer

    hp = tiny_model_hp(
        languages=["german", "french"],
        multi_language=True,
        encoder_type="generated",
        balanced_sampling=True,
        perfect_sampling=True,
        batch_size=4,           # 2 langs x dp=2
        case_sensitive=False,
        griffin_lim_iters=2,
    )

    corpus = os.path.join(workdir, "corpus")
    marker = os.path.join(workdir, "corpus.ready")
    if pid == 0:
        os.makedirs(corpus, exist_ok=True)
        # 8 per language -> 4 val items = one full perfect batch (2 langs x 2)
        build_corpus_with_metafiles(corpus, hp, n_per_lang=8)
        with open(marker, "w") as f:
            f.write("ok")
    else:
        deadline = time.time() + 120
        while not os.path.exists(marker):
            time.sleep(0.2)
            if time.time() > deadline:
                raise TimeoutError("corpus was never built")

    data = TextToSpeechDatasetCollection(corpus, hp)
    mesh = make_mesh(hp)  # all global devices: data=2
    assert mesh.shape == {"data": 2, "model": 1}

    trainer = Trainer(
        hp, data, mesh=mesh, seed=0,
        checkpoint_dir=os.path.join(workdir, "ckpts") if pid == 0 else None,
        log_dir=os.path.join(workdir, "logs") if pid == 0 else None,
    )
    steps = trainer.train_epoch()
    eval_loss = trainer.evaluate()
    assert eval_loss > 0.0, "evaluation ran no batches"
    if pid == 0:
        path = trainer.save(eval_loss)
        assert os.path.exists(path)

    print(json.dumps({
        "pid": pid, "steps": steps, "eval_loss": eval_loss,
        "devices": jax.device_count(),
    }), flush=True)


if __name__ == "__main__":
    main()
