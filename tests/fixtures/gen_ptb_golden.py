#!/usr/bin/env python3
"""Regenerate tests/fixtures/ptb_golden.json.

The fixture pins ptb_tokenize output (and scorer output downstream of it)
on ~300 realistic captions so any tokenizer change shows up as explicit
golden drift (round-5 verdict item 4). Hand-authored tricky cases cover
every CoreNLP behavior class the tokenizer ports; the templated tail adds
realistic caption bulk. Run from the repo root:

    python tests/fixtures/gen_ptb_golden.py
"""
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from vast_tpu.evaluation.metrics.text import (  # noqa: E402
    bleu,
    cider,
    ptb_tokenize,
    rouge_l,
)

TRICKY = [
    "A man is riding a horse on the beach.",
    "Two dogs play tug-of-war with a rope toy.",
    "a state-of-the-art self-driving car turns left",
    "The chef adds 1,000 grams of flour and 2.5 cups of water.",
    "A sign reads “No Parking” near the curb.",
    "Someone's dog won't stop barking at the mailman.",
    "They're gonna love this three-tier cake!",
    "Mr. and Mrs. Smith cut their 25th anniversary cake.",
    "Dr. Lee points at an x-ray on the screen.",
    "A U.S. flag waves over the stadium.",
    "The price tag shows $19.99 (marked down from $35).",
    "It's 5:30 a.m. and the street is empty…",
    "A black/white photo of a 1950s diner.",
    "Kids aged 8-10 line up for the school bus.",
    "She can't believe the magician's trick — neither can I.",
    "The recipe needs 3/4 cup of sugar.",
    "Add ½ cup of sugar and ¼ teaspoon of salt to ¾ of the mix.",
    "A man in a t-shirt and jeans skateboards downhill.",
    "Don't feed the animals, says the zookeeper.",
    "A close-up of a bee on a sunflower [slow motion].",
    "The scoreboard reads 3:2 at half-time.",
    "People cheer as the runner crosses the finish line!",
    "An old steam train (built in 1923) leaves the station.",
    "The colour of the sky changes at dusk over the harbour.",
    "A favourite neighbourhood theatre shows a film.",
    "Workers load 40 ft. containers onto a ship.",
    "He weighs about 180 lbs and stands 6 ft tall.",
    "A chef who's won awards plates a five-course meal.",
    "Cars travel 65 mph on the interstate; trucks go slower.",
    "“Watch this!” the boy shouts, doing a backflip.",
    "The DJ mixes hip-hop & electronic music.",
    "A mother-of-three juggles groceries and a stroller.",
    "Divers explore a shipwreck 30 metres underwater.",
    "The jewellery store displays a diamond necklace.",
    "A man with a moustache eats a doughnut.",
    "An aeroplane takes off into the grey sky.",
    "Q&A session follows the keynote talk.",
    "The thermometer reads -5 degrees this morning.",
    "Athletes warm up before the 4x100 relay.",
    "A 10,000-seat arena fills up before the concert.",
    "The toddler says ‘more, more!’ at dinner.",
    "Vol. 2 of the series sits on the shelf.",
    "Prof. Chan explains the experiment to students.",
    "Gen. Patton's jeep is displayed in the museum.",
    "The bakery sells two-for-one croissants on Tuesdays.",
    "A drone films the canyon from 400 ft. up.",
    "I'm sure they've seen it; we'll ask them later.",
    "She'd rather walk; he'd rather bike.",
    "The cat leaps... and misses the counter.",
    "Fans wave red-and-white scarves in the stands.",
    "A fisherman reels in a 12 lb. bass.",
    "The orchestra tunes up -- strings first, then brass.",
    "Tourists photograph the 2,000-year-old ruins.",
    "A barista pours latte art into a 12 oz cup.",
    "Number 24 dribbles past two defenders and scores.",
    "The bride and groom's first dance begins.",
    "Snow falls on the mountain's north face.",
    "A news anchor reports live from the scene.",
    "The robot vacuums the living room by itself.",
    "Surfers catch 6-8 foot waves at dawn.",
    "An artist sketches passers-by in the park.",
]

SUBJECTS = ["a man", "a woman", "a young boy", "an elderly woman",
            "two children", "a group of friends", "the chef", "a dog",
            "a cat", "the athlete", "a street performer", "a tourist"]
VERBS = ["walks through", "runs across", "looks at", "plays in",
         "jumps over", "stands near", "sits beside", "rides through",
         "points at", "smiles at"]
OBJECTS = ["a busy market", "the old bridge", "a sunny park",
           "the crowded street", "a quiet beach", "the museum hall",
           "a snowy field", "the train station", "a flower garden",
           "the city square"]
TAILS = ["at sunset", "in the rain", "on a summer day", "while laughing",
         "with an umbrella", "before the storm", "during the festival",
         "as the crowd watches", "in slow motion", "on a cloudy morning"]


def main():
    caps = list(TRICKY)
    combos = itertools.cycle(
        itertools.islice(
            zip(itertools.cycle(SUBJECTS), itertools.cycle(VERBS[:7]),
                itertools.cycle(OBJECTS[:9]), itertools.cycle(TAILS)),
            10_000))
    seen = set(caps)
    while len(caps) < 300:
        s, v, o, t = next(combos)
        c = f"{s} {v} {o} {t}."
        if c not in seen:
            seen.add(c)
            caps.append(c)

    entries = [{"caption": c, "tokens": ptb_tokenize(c)} for c in caps]

    # scorer-level pin: treat caption i as the hypothesis for key i with
    # the two neighbours as references — exercises BLEU/ROUGE-L/CIDEr on
    # exactly the tokens the tokenizer produced
    gts, res = {}, {}
    for i, e in enumerate(entries):
        k = f"c{i}"
        gts[k] = [entries[i]["tokens"],
                  entries[(i + 1) % len(entries)]["tokens"]]
        res[k] = [entries[(i + 2) % len(entries)]["tokens"] or ["empty"]]
    scores = {
        "bleu": [round(x, 12) for x in bleu(gts, res)],
        "rouge_l": round(rouge_l(gts, res), 12),
        "cider": round(cider(gts, res), 12),
    }

    out = os.path.join(os.path.dirname(__file__), "ptb_golden.json")
    with open(out, "w") as f:
        json.dump({"entries": entries, "scores": scores}, f, indent=1)
    print(f"wrote {out}: {len(entries)} captions, scores={scores}")


if __name__ == "__main__":
    main()
