/* C ABI smoke test: exercises the shim end-to-end.
 *
 * Usage: test_shim [MODEL_FILE]
 * Without a model: tokenize + options + enums.  With MLIS_TINY_MODELS=1 and
 * a tiny checkpoint: full generate.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "mlimgsynth.h"

static int g_steps_seen = 0;

static int progress_cb(void *user, MLIS_Ctx *ctx, const MLIS_Progress *prg)
{
	(void)user; (void)ctx;
	printf("  progress %s %d/%d nfe=%d\n", mlis_stage_str(prg->stage),
		prg->step, prg->step_end, prg->nfe);
	if (prg->stage == MLIS_STAGE_DENOISE) g_steps_seen++;
	return 0;
}

#define CHECK(COND, MSG) do { \
	if (!(COND)) { printf("FAIL: %s\n", MSG); return 1; } \
	printf("ok: %s\n", MSG); \
} while (0)

int main(int argc, char **argv)
{
	MLIS_Ctx *ctx = mlis_ctx_create();
	CHECK(ctx != NULL, "ctx create");

	/* enums */
	CHECK(!strcmp(mlis_method_str(MLIS_METHOD_EULER), "euler"), "method str");
	CHECK(mlis_method_fromz("dpmpp2m") == MLIS_METHOD_DPMPP2M, "method fromz");
	CHECK(mlis_method_fromz("DPM++2M") == MLIS_METHOD_DPMPP2M,
		"method fromz dpm++ alias");
	CHECK(!strcmp(mlis_stage_desc(MLIS_STAGE_DENOISE), "Denoising"),
		"stage desc");
	CHECK(mlis_stage_fromz("image-decode") == MLIS_STAGE_IMAGE_DECODE,
		"stage fromz hyphen");
	CHECK(!strcmp(mlis_loglvl_str(MLIS_LOGLVL_INFO), "info"), "loglvl str");
	CHECK(mlis_loglvl_fromz("DEBUG") == MLIS_LOGLVL_DEBUG, "loglvl fromz");
	CHECK(!strcmp(mlis_model_type_desc(MLIS_MODEL_TYPE_SDXL),
		"Stable Diffusion XL"), "model type desc");
	CHECK(!strcmp(mlis_option_str(MLIS_OPT_CFG_SCALE), "cfg_scale"),
		"option str");
	CHECK(mlis_option_fromz("CFG-Scale") == MLIS_OPT_CFG_SCALE,
		"option fromz");
	CHECK(mlis_option_fromz("nonsense") == (MLIS_Option)-1,
		"option fromz unknown -> -1");
	CHECK(!strcmp(mlis_state_str(MLIS_STAGE_DENOISE), "denoise"),
		"state str alias");
	/* round-4 additive ids: every string-side option/schedule has an id
	 * (by-id/by-string parity, reference src/mlimgsynth_options_set.c.h) */
	CHECK(!strcmp(mlis_sched_str(MLIS_SCHED_EXPONENTIAL), "exponential"),
		"sched str exponential");
	CHECK(mlis_sched_fromz("SGM-Uniform") == MLIS_SCHED_SGM_UNIFORM,
		"sched fromz sgm_uniform");
	CHECK(mlis_sched_fromz("beta") == MLIS_SCHED_BETA, "sched fromz beta");
	CHECK(!strcmp(mlis_option_str(MLIS_OPT_DEEPCACHE), "deepcache"),
		"option str deepcache");
	CHECK(mlis_option_fromz("SLG-Scale") == MLIS_OPT_SLG_SCALE,
		"option fromz slg_scale");
	CHECK(mlis_option_fromz("subseed-strength") == MLIS_OPT_SUBSEED_STRENGTH,
		"option fromz subseed_strength");
	{
		/* mlis_tensor_for: flat index must walk innermost-first */
		MLIS_Tensor t = {0};
		mlis_tensor_resize(&t, 2, 3, 2, 1);
		mlis_tensor_for(t, i) { t.d[ip] = (float)(i0 + 10*i1 + 100*i2); }
		CHECK(t.d[0] == 0.0f && t.d[1] == 1.0f && t.d[2] == 10.0f &&
			t.d[11] == 121.0f, "mlis_tensor_for order");
		mlis_tensor_free(&t);
	}

	/* options */
	CHECK(mlis_option_set(ctx, MLIS_OPT_IMAGE_DIM, 64, 64) >= 0, "image-dim");
	CHECK(mlis_option_set(ctx, MLIS_OPT_CFG_SCALE, 7.0) >= 0, "cfg-scale");
	CHECK(mlis_option_set_str(ctx, "method", "euler_a") >= 0, "method str opt");
	CHECK(mlis_option_set_str(ctx, "definitely-not-real", "1")
		== MLIS_E_UNK_OPT, "unknown option -> MLIS_E_UNK_OPT");
	CHECK(mlis_option_set_str(ctx, "method", "not-a-method")
		== MLIS_E_OPT_VALUE, "bad value -> MLIS_E_OPT_VALUE");
	/* round-4 options by id, with the same validation as by string */
	CHECK(mlis_option_set(ctx, MLIS_OPT_SCHEDULER, MLIS_SCHED_EXPONENTIAL)
		>= 0, "scheduler by id (exponential)");
	CHECK(mlis_option_set(ctx, MLIS_OPT_CFG_RESCALE, 0.5) >= 0,
		"cfg-rescale by id");
	CHECK(mlis_option_set(ctx, MLIS_OPT_CFG_RESCALE, 1.5)
		== MLIS_E_OPT_VALUE, "cfg-rescale range check by id");
	CHECK(mlis_option_set(ctx, MLIS_OPT_SLG_SCALE, -1.0)
		== MLIS_E_OPT_VALUE, "negative slg-scale rejected by id");
	CHECK(mlis_option_set(ctx, MLIS_OPT_SLG_LAYERS, "7,8,9") >= 0,
		"slg-layers by id");
	CHECK(mlis_option_set(ctx, MLIS_OPT_DEEPCACHE, 0) >= 0,
		"deepcache by id");
	CHECK(mlis_option_set(ctx, MLIS_OPT_SUBSEED, (uint64_t)7) >= 0,
		"subseed by id");
	CHECK(mlis_option_set(ctx, MLIS_OPT_SUBSEED_STRENGTH, 0.0) >= 0,
		"subseed-strength by id");
	CHECK(mlis_option_set(ctx, MLIS_OPT_FREEU, "n") >= 0, "freeu by id");
	{
		/* read back by id: the value set above crosses the ABI both ways */
		const char *v = NULL;
		CHECK(mlis_option_get(ctx, MLIS_OPT_SLG_LAYERS, &v) >= 0 && v &&
			!strcmp(v, "7,8,9"), "option_get slg-layers readback");
		CHECK(mlis_option_get(ctx, MLIS_OPT_CFG_RESCALE, &v) >= 0 && v &&
			!strcmp(v, "0.5"), "option_get cfg-rescale readback");
	}
	mlis_option_set(ctx, MLIS_OPT_CFG_RESCALE, 0.0);
	mlis_option_set_str(ctx, "scheduler", "uniform");
	{
		/* missing model file must cross the ABI as MLIS_E_FILE_NOT_FOUND */
		MLIS_Ctx *c2 = mlis_ctx_create();
		mlis_option_set_str(c2, "model", "/no/such/model.safetensors");
		CHECK(mlis_setup(c2) == MLIS_E_FILE_NOT_FOUND,
			"missing model -> MLIS_E_FILE_NOT_FOUND");
		mlis_ctx_destroy(&c2);
	}

	/* tokenizer through the ABI */
	mlis_option_set_str(ctx, "model-type", "sd1");
	int32_t *tokens = NULL;
	int n = mlis_text_tokenize(ctx, "a dog jumping", &tokens,
		MLIS_SUBMODEL_CLIP);
	CHECK(n == 3 && tokens && tokens[0] == 320 && tokens[1] == 1929 &&
		tokens[2] == 11476, "tokenize golden");

	if (argc > 1) {
		printf("generating with model %s\n", argv[1]);
		CHECK(mlis_option_set(ctx, MLIS_OPT_MODEL, argv[1]) >= 0, "model");
		CHECK(mlis_option_set(ctx, MLIS_OPT_SEED, (uint64_t)42) >= 0, "seed");
		CHECK(mlis_option_set(ctx, MLIS_OPT_STEPS, 2) >= 0, "steps");
		CHECK(mlis_option_set_str(ctx, "weight-type", "f32") >= 0, "wtype");
		CHECK(mlis_option_set(ctx, MLIS_OPT_CALLBACK, progress_cb,
			(void*)0) >= 0, "callback");
		CHECK(mlis_option_set(ctx, MLIS_OPT_PROMPT, "a (cat:1.2) photo")
			>= 0, "prompt");
		/* round-4 ids drive a real generate and land in infotext */
		CHECK(mlis_option_set(ctx, MLIS_OPT_PAG_SCALE, 2.0) >= 0,
			"pag-scale by id");
		CHECK(mlis_option_set(ctx, MLIS_OPT_SUBSEED, (uint64_t)7) >= 0,
			"subseed by id (generate)");
		CHECK(mlis_option_set(ctx, MLIS_OPT_SUBSEED_STRENGTH, 0.25) >= 0,
			"subseed-strength by id (generate)");
		int r = mlis_generate(ctx);
		if (r < 0) printf("generate error: %s\n", mlis_errstr_get(ctx));
		CHECK(r >= 0, "generate");
		CHECK(g_steps_seen == 2, "per-step callbacks");
		MLIS_Image *img = mlis_image_get(ctx, 0);
		CHECK(img && img->w == 64 && img->h == 64 && img->c == 3,
			"image 64x64x3");
		const char *info = mlis_infotext_get(ctx, 0);
		CHECK(info && strstr(info, "Seed: 42"), "infotext");
		CHECK(info && strstr(info, "PAG scale: 2"),
			"infotext PAG (id-set option reaches infotext)");
		CHECK(info && strstr(info, "Variation seed: 7"),
			"infotext variation seed");
		MLIS_Tensor *lat = mlis_tensor_get(ctx, MLIS_TENSOR_LATENT);
		CHECK(lat && lat->n[0] == 8 && lat->n[2] == 4, "latent tensor");
	}

	mlis_ctx_destroy(&ctx);
	CHECK(ctx == NULL, "ctx destroy");
	printf("TEST OK test_shim\n");
	return 0;
}
