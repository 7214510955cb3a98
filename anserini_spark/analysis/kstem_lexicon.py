"""Headword lexicon for the KStem (Krovetz) stemmer.

KStem's dictionary gate needs a broad list of English base forms
("return a real word" is the contract — a suffix is removed only when
the result is a known word). Lucene's KStemFilter ships ~30K
headwords; this module carries a from-scratch common-English lemma
list (public vocabulary, no copied wordlist) that covers the
vocabulary mass of web/news text. Off-list rare words fall back to
KStem's own default for unknown derivations: leave unchanged.

The list holds lowercase base forms only (nouns/verbs/adjectives in
citation form, length >= 3). A handful of lexicalized -ing/-ed forms
that real KStem keeps intact (e.g. "running", "building", "morning")
are included deliberately. The round-4 block at the end adds the
high-frequency mass measured missing on the reference's
robust04/core18/adhoc topics: irregular verb/pronoun forms that
no KStem rule touches (identity is real KStem behavior),
countries/nationalities (kstem.c ships a proper-noun dictionary
supplement), common derived lemmas, adverbs, and abbreviations.
"""

LEXICON_WORDS = """
aardvark abacus abandon abbey abbreviate abdicate abdomen abduct
aberration abhor abide ability abject ablaze able abnormal abnormality
aboard abode abolish abolition abominable aboriginal abort abortion
abound abrasive abreast abridge abrupt abscess abscond abseil absence
absent absentee absinthe absolute absolution absolve absorb abstain
abstinence abstract abstraction absurd abundance abundant abuse abyss
acacia academia academic academy accelerate accent accept access
accessory accident acclaim acclimate accolade accommodate accompany
accomplish accord accordion accost account accredit accrue accumulate
accuracy accurate accuse accustom ace acerbic acetate acetone ache
achieve acid acidic acknowledge acorn acoustic acquaint acquiesce
acquire acquisition acquit acre acrid acrobat acronym across acrylic
act action actionable active activist activity actor actress actual
actuary acumen acupuncture acute adage adamant adapt add addendum
adder addict addition additive address adept adequate adhere adhesive
adjacent adjective adjourn adjudicate adjunct adjust adlib administer
administration admiral admire admission admit admonish adobe
adolescent adopt adore adorn adrenaline adrift adroit adulation adult
adultery advance advantage adventure adverb adverse advert advertise
advice advise adviser advocate aerial aerobic aerosol aerospace
aesthetic affable affair affect affection affidavit affiliate affinity
affirm affix afflict affluent afford affront afraid africa after
aftermath afternoon aftershock again against agate age agency agenda
agent aggravate aggregate aggression aggressive aghast agile agitate
agnostic ago agony agrarian agree agriculture aground ahead aid aide
ailment aim air airborne aircraft airfield airline airport airship
airtight airway aisle ajar akin alabaster alacrity alarm albatross
albeit albino album alchemy alcohol alcove alderman alert alfalfa
algae algebra algorithm alias alibi alien align alike alimony alive
alkali alkaline all allay allege allegiance allegory allegro allergy
alleviate alley alliance alligator alliteration allocate allot allow
allowance alloy allude allure allusion ally almanac almond almost aloe
aloft alone along aloof aloud alpaca alphabet alpine already also
altar alter altercation alternate alternative although altitude alto
altogether altruism aluminum alumnus always amalgam amass amateur
amaze ambassador amber ambiguous ambition ambitious ambivalent amble
ambrosia ambulance ambush ameliorate amenable amend amendment amenity
amethyst amiable amicable amid amiss ammonia ammunition amnesia
amnesty amoeba amok among amorous amorphous amount amphibian
amphitheater ample amplify amplitude amputate amulet amuse anagram
analgesic analog analogy analysis analyst analyze anarchist anarchy
anathema anatomy ancestor anchor anchovy ancient ancillary and android
anecdote anemia anemone anesthesia aneurysm anew angel angelic anger
angle angry angst anguish angular aniline animal animate animosity
anise ankle annals anneal annex annihilate anniversary annotate
announce annoy annual annuity annul anode anoint anomaly anon
anonymous anorak another answer ant antenna anthem anther anthology
anthropology antibiotic antibody antic anticipate antidote antifreeze
antimony antipathy antiquated antique antiquity antiseptic antithesis
antler antonym anvil anxiety anxious any anybody anymore anyone
anything anyway anywhere aorta apart apartment apathetic apathy
aperture apex aphid aphorism aplomb apocalypse apocryphal apogee
apologetic apologize apology apoplexy apostle apostrophe apothecary
appall apparatus apparel apparent apparition appeal appear appearance
appease appellate appendage appendix appetite applaud applause apple
appliance applicant apply appoint appointment appraise appreciable
appreciate apprehend apprentice apprise approach approbation
appropriate appropriation approval approve approximate apricot april
apron apt aptitude aquarium aquatic aqueduct arable arbiter arbitrage
arbitrary arbitrate arbor arc arcade arcane arch archaeology archaic
archbishop archer archetype archipelago architect architecture archive
arctic ardent ardor arduous area arena argue argument arid arise
aristocracy aristocrat arithmetic arm armada armadillo armament
armchair armistice armor armory armpit army aroma around arraign
arrange array arrears arrest arrival arrive arrogant arrow arsenal
arsenic arson art artery artful arthritis artichoke article articulate
artifact artificial artillery artisan artist artistic ascend ascent
ascertain ascetic ascribe ash ashamed ashen ashore ashtray aside
asinine ask askew asleep asparagus aspect aspen asphalt aspirate
aspire aspirin assail assassin assassinate assault assemble assembly
assent assert assess asset assiduous assign assignment assimilate
assist assistant associate association assort assuage assume
assumption assurance assure asterisk asteroid asthma astonish astound
astray astringent astrology astronaut astronomy astute asunder asylum
atheist athlete athletic atlas atmosphere atoll atom atomic atone
atrium atrocious atrocity atrophy attach attache attack attain attempt
attend attendance attention attest attic attire attitude attorney
attract attraction attractive attribute attrition attune atypical
auburn auction audacious audacity audible audience audio audit
audition auditorium auger augment augur august aunt aura aural
auspices auspicious austere austerity authentic authenticate author
authoritarian authoritative authority authorize autism auto autocrat
autograph automate automatic automobile autonomy autopsy autumn
auxiliary avail available avalanche avarice avenge avenue average
aversion avert aviary aviation avid avionics avocado avoid await awake
award aware awash away awe awesome awful awkward awning awry axiom
axis axle azalea azure babble baboon baby baccalaureate bachelor
bacillus back backbone backdrop backfire backgammon background
backlash backlog backpack backside backstage backtrack backward bacon
bacteria bacterium bad badge badger badminton baffle bag bagel baggage
baggy bagpipe bail bailiff bait bake baker bakery balance balcony bald
bale balk ball ballad ballast ballerina ballet balloon ballot ballroom
balm balmy balsa bamboo bamboozle ban banal banana band bandage bandit
bandwagon bandwidth bane bang bangle banish banister banjo bank
bankrupt bankruptcy banner banquet banter baptism baptize bar barb
barbarian barbecue barber bard bare bargain barge baritone bark barley
barn barnacle barometer baron baroque barrack barracuda barrage barrel
barren barricade barrier barrister barter basalt base baseball
basement bashful basic basil basin basis bask basket basketball bass
bassoon bastion bat batch bath bathe bathrobe bathroom baton battalion
batten batter battery battle battlefield battleship bauble baud bawdy
bawl bay bayonet bayou bazaar beach beacon bead beagle beak beaker
beam bean bear beard bearer bearing beast beat beaten beater beautiful
beauty beaver because beckon become bed bedlam bedrock bedroom bedside
bedtime bee beech beef beehive beeline beep beer beet beetle befall
befit before befriend beg beggar begin behalf behave behavior behemoth
behest behind behold beige being belabor belated belch belfry belie
belief believe bell bellow belly belong beloved below belt bemoan
bemuse bench benchmark bend beneath benediction benefactor beneficial
beneficiary benefit benevolent benign bent bequeath bequest berate
bereave beret berry berserk berth beseech beset beside besides besiege
best bestow bet betray betrothal better between beverage bevy beware
bewilder bewitch beyond bias bib bible bibliography bicker bicycle bid
biennial bifocal big bigamy bigot bike bile bilge bilingual bilk bill
billboard billiards billion billow bin binary bind binder binge
binocular biography biology biopsy biped birch bird birth birthday
birthmark birthplace birthright biscuit bisect bishop bison bistro bit
bite bitter bizarre blab black blackberry blackbird blackboard blacken
blacklist blackmail blacksmith bladder blade blame blanch bland blank
blanket blare blaspheme blasphemy blast blatant blaze blazer bleach
bleak bleat bleed blemish blend bless blight blimp blind blink blip
bliss blister blithe blitz blizzard bloat blob bloc block blockade
blockage blockbuster blond blood bloom blossom blot blotch blouse blow
bludgeon blue bluebell blueberry bluebird blueprint bluff blunder
blunt blur blurb blurt blush bluster boar board boardwalk boast boat
bobbin bobcat bode bodice bodily body bodyguard bog bogus boil boiler
boisterous bold bolster bolt bomb bombard bombardment bombastic
bonanza bond bondage bone bonfire bonnet bonus bony booby boogie book
bookcase bookkeeper booklet bookmark bookstore boom boomerang boon
boost booster boot booth bootleg booty booze borax bordello border
bore boring born borough borrow bosom boss botany botch both bother
bottle bottleneck bottom boudoir bough boulder boulevard bounce bound
boundary bounty bouquet bourbon bout boutique bovine bow bowel bower
bowl box boxcar boxer boy boycott boyfriend boyhood brace bracelet
bracket brackish brag braid braille brain brake bramble bran branch
brand brandish brandy brash brass brassiere brat bravado brave bravery
brawl brawn bray brazen breach bread breadth break breakdown breaker
breakfast breakthrough breakup breast breath breathe breathless breed
breeze brethren brevity brew brewery bribe bribery brick bridal bride
bridge bridle brief brigade brigand bright brighten brilliance
brilliant brim brine bring brink brisk bristle brittle broach broad
broadcast broaden broadside brocade broccoli brochure brogue broil
broke broken broker bromide bronchitis bronco bronze brooch brood
brook broom broth brothel brother brow browbeat brown browse bruise
brunch brunette brunt brush brusque brutal brute bubble buck bucket
buckle bucolic bud buddy budge budget buffalo buffer buffet buffoon
bug buggy bugle build building bulb bulge bulk bulky bull bulldozer
bullet bulletin bullion bully bulwark bumblebee bump bumper bumpkin
bunch bundle bungalow bungle bunk bunker bunny buoy buoyant burden
bureau bureaucracy bureaucrat burgeon burglar burglary burial burlap
burlesque burly burn burner burnish burp burrow bursar burst bury bus
bush bushel business bust bustle busy but butcher butler butte butter
buttercup butterfly buttermilk butternut buttock button buttress buxom
buy buzz buzzard bygone bylaw bypass byproduct bystander byte byword
cab cabaret cabbage cabin cabinet cable caboose cache cackle cactus
cadaver caddy cadence cadet cadmium cafe cafeteria caffeine cage cagey
cairn cajole cake calamity calcium calculate calculus caldron calendar
calf caliber calibrate calico caliper calisthenics call calligraphy
callous callus calm calorie calypso camaraderie cameo camera
camouflage camp campaign camphor campus can canal canary cancel cancer
candelabra candid candidacy candidate candle candor candy cane canine
canister canker cannibal cannon canoe canon canopy cantaloupe
cantankerous canteen canter canvas canvass canyon cap capability
capable capacitor capacity cape caper capillary capital capitalism
capitalize capitol capitulate capricious capsize capsule captain
caption captivate captive captor capture car caramel carat caravan
carbohydrate carbon carburetor carcass card cardboard cardiac cardigan
cardinal cardiology care careen career carefree careful caress
caretaker cargo caribou caricature carnage carnal carnival carol
carouse carousel carp carpenter carpet carriage carrion carrot carry
cart cartel cartilage cartographer carton cartoon cartridge carve
cascade case casement cash cashew cashier cashmere casino cask casket
casserole cassette cast caste caster castigate castle casual casualty
cat cataclysm catacomb catalog catalyst catapult cataract catastrophe
catch catcher catechism category cater caterpillar cathedral catheter
cathode catholic catsup cattle caucus cauliflower cause causeway
caustic caution cautious cavalcade cavalier cavalry cave cavern caviar
cavity cavort cease cedar cede ceiling celebrate celebrity celery
celestial celibate cell cellar cello cellophane cellular cellulose
cement cemetery censor censure census cent centennial center
centigrade centimeter centipede central centrifuge century ceramic
cereal cerebral ceremony certain certificate certify cervical
cessation cesspool chafe chagrin chain chair chairman chalet chalice
chalk challenge chamber chameleon chamois champagne champion
championship chance chancellor chandelier change channel chaos chap
chapel chaperone chaplain chapter char character characteristic
characterize charcoal charge chariot charisma charitable charity
charlatan charm chart charter chase chasm chassis chaste chastise chat
chatter chauffeur chauvinism cheap cheapen cheat check checker
checkpoint cheddar cheek cheer cheerful cheese cheetah chef chemical
chemist chemistry cherish cherry cherub chess chest chestnut chevron
chew chic chicanery chick chicken chide chief chiffon chigger child
childhood chill chime chimney chimpanzee chin china chinchilla chip
chipmunk chiropractor chirp chisel chivalry chive chlorine chloroform
chlorophyll chock chocolate choice choir choke cholera cholesterol
chomp choose chop chopstick choral chord chore choreography chorus
chowder christen chrome chromium chromosome chronic chronicle
chronology chrysalis chrysanthemum chubby chuck chuckle chug chum
chunk church churn chute cider cigar cigarette cinch cinder cinema
cinnamon cipher circa circle circuit circular circulate circumference
circumstance circumvent circus cistern citadel citation cite citizen
citrus city civic civil civilian civilization clad claim clairvoyant
clam clamber clammy clamor clamp clan clandestine clang clap clarify
clarinet clarity clash clasp class classic classify classroom clatter
clause claustrophobia claw clay clean cleanse clear clearance cleat
cleave clef clemency clench clergy cleric clerical clerk clever cliche
click client clientele cliff climate climax climb clinch cling clinic
clink clip clipboard clipper clique cloak clobber clock clockwise clod
clog cloister clone close closet closure clot cloth clothe clothes
cloud clout clove clover clown club cluck clue clump clumsy cluster
clutch clutter coach coagulate coal coalesce coalition coarse coast
coaster coat coax cobalt cobbler cobra cobweb cocaine cockpit
cockroach cocktail cocoa coconut cocoon cod coddle code codify coerce
coexist coffee coffer coffin cog cogent cognac cognition cognizant
coherent cohesion cohort coil coin coincide coke colander cold
collaborate collage collapse collar collateral colleague collect
collection collective collector college collide collie collision
colloquial collusion cologne colon colonel colonial colony color
colossal colt column columnist coma comb combat combination combine
combustion come comedian comedy comet comfort comfortable comic comma
command commandeer commander commemorate commence commend commensurate
comment commentary commerce commercial commission commit commitment
committee commodity commodore common commonplace commonwealth
commotion communal commune communicate communication communion
communism community commute compact companion company comparable
compare comparison compartment compass compassion compatible compel
compensate compete competence competent competition competitive
compile complacent complain complaint complement complete complex
complexion compliance complicate complication complicity compliment
comply component compose composite composition compost composure
compound comprehend comprehensive compress comprise compromise
comptroller compulsion compute computer comrade concave conceal
concede conceit conceive concentrate concentric concept conception
concern concert concerto concession conch concierge conciliate concise
conclave conclude conclusion concoct concord concourse concrete concur
concussion condemn condense condescend condiment condition condolence
condone conducive conduct conductor conduit cone confection
confederate confer conference confess confetti confidant confide
confidence confident confidential configuration configure confine
confirm confiscate conflagration conflict conform confound confront
confuse confusion congeal congenial congenital congest conglomerate
congratulate congregate congress congruent conifer conjecture
conjugate conjunction conjure connect connection connive connoisseur
connote conquer conquest conscience conscious conscript consecrate
consecutive consensus consent consequence conservative conservatory
conserve consider considerable consign consist consistent console
consolidate consonant consort consortium conspicuous conspiracy
conspire constable constant constellation consternation constipation
constituent constitute constitution constrain constraint constrict
construct construction construe consul consult consultant consume
consumer consummate consumption contact contagious contain container
contaminate contemplate contemporary contempt contend content contest
context contiguous continent contingent continual continue continuous
contort contour contraband contraception contract contradict
contradiction contraption contrary contrast contravene contribute
contribution contrite contrive control controversial controversy
convalesce convene convenience convenient convent convention
conventional converge conversation converse convert convex convey
convict conviction convince convoluted convoy convulse cook cookie
cool coop cooperate cooperative coordinate cop cope copier copious
copper copse copulate copy copyright coral cord cordial cordon
corduroy core cork cormorant corn cornea corner cornerstone cornice
coronary coronation coroner corporal corporate corporation corps
corpse corpulent corpus corral correct correlate correspond corridor
corroborate corrode corrupt corruption corsage corset cortex cosmetic
cosmic cosmopolitan cosmos cost costume cot cottage cotton couch
cougar cough council counsel count countenance counter counterfeit
counterpart countess country county coup couple coupon courage courier
course court courteous courtesy courtship courtyard cousin cove
covenant cover covert covet cow coward cowboy cower coy coyote cozy
crab crack cradle craft crafty crag cram cramp cranberry crane cranium
crank cranny crash crass crate crater cravat crave crawl crayon craze
crazy creak cream crease create creation creative creature credence
credential credible credit creed creek creep cremate crepe crescendo
crescent crest crevice crew crib cricket crime criminal crimson cringe
cripple crisis crisp criteria criterion critic critical criticism
criticize critique croak crochet crock crocodile crocus crony crook
crop croquet cross crossing crossroad crouch crow crowbar crowd crown
crucial crucible crucifix crude cruel cruise crumb crumble crumple
crunch crusade crush crust crustacean crutch crux cry crypt cryptic
crystal cub cube cubicle cuckoo cucumber cuddle cudgel cue cuff
cuisine culinary cull culminate culpable culprit cult cultivate
cultural culture culvert cumbersome cumulative cunning cup cupboard
curate curator curb curd curdle cure curfew curio curiosity curious
curl currant currency current curriculum curry curse cursor cursory
curt curtail curtain curtsy curve cushion cusp custard custodian
custody custom customary customer cut cute cuticle cutlass cutlery
cyanide cycle cyclone cylinder cymbal cynic cynical cypress cyst czar
dab dabble dachshund daffodil dagger daily dainty dairy dais daisy
dale dally dam damage damask dame damp damsel dance dandelion dandruff
dandy danger dangle dank dapper dare dark darken darling darn dart
dash dashboard dastardly data database date daub daughter daunt dawdle
dawn day daybreak daydream daylight daze dazzle deacon dead deaden
deadline deadlock deaf deafen deal dealer dean dear dearth death
debacle debase debate debauchery debilitate debit debonair debris debt
debtor debut decade decadent decant decapitate decay decease deceit
deceive decelerate december decent decentralize deception decibel
decide deciduous decimal decimate decipher decision deck declaim
declare decline decompose decorate decorum decoy decrease decree
decrepit dedicate deduce deduct deed deem deep deepen deer deface
default defeat defect defend defense defer defiance deficient deficit
defile define definite definition deflate deflect deform defraud
defrost deft defunct defy degenerate degrade degree dehydrate deign
deity dejected delay delectable delegate delete deliberate delicacy
delicate delicatessen delicious delight delineate delinquent delirious
deliver delivery delta delude deluge delusion delve demagogue demand
demarcate demean demeanor demented demise democracy democrat
democratic demolish demon demonstrate demoralize demote demure den
denial denim denizen denomination denote denounce dense density dent
dental dentist denture denude deny deodorant depart department
departure depend dependent depict deplete deplore deploy deport depose
deposit depot deprave depreciate depress depression deprive depth
deputy derail derange derby derelict deride derive derogatory derrick
descend descent describe description desecrate desert deserve design
designate desirable desire desist desk desolate despair desperado
desperate despise despite despondent despot dessert destination
destine destiny destitute destroy destruction detach detail detain
detect detective detector detention deter detergent deteriorate
determine detest detonate detour detract detriment devastate develop
development deviate device devil devious devise devoid devote devour
devout dew dexterity diabetes diagnose diagnosis diagonal diagram dial
dialect dialogue diameter diamond diaper diaphragm diary dice dictate
dictator diction dictionary didactic die diesel diet differ difference
different difficult difficulty diffuse dig digest digit digital
dignify dignitary dignity digress dike dilapidated dilate dilemma
diligent dilute dim dime dimension diminish dimple din dine dinghy
dingy dinner dinosaur diocese dioxide dip diphtheria diploma diplomat
dire direct direction director dirge dirt dirty disable disadvantage
disagree disappear disappoint disarm disarray disaster disavow disband
disbelief disburse disc discard discern discharge disciple discipline
disclaim disclose discomfort disconcert disconnect discontent discord
discount discourage discourse discover discovery discreet discrepancy
discrete discretion discriminate discuss discussion disdain disease
disembark disenchant disengage disfigure disgorge disgrace disgruntle
disguise disgust dish dishearten dishevel dishonest disillusion
disinfect disintegrate disinterested disjointed disk dislike dislocate
dislodge dismal dismantle dismay dismiss dismount disobey disorder
disown disparage disparate dispatch dispel dispense disperse displace
display displease dispose disposition disprove dispute disqualify
disquiet disregard disrepair disrepute disrespect disrupt dissatisfy
dissect disseminate dissent dissertation dissident dissipate dissolve
dissuade distance distant distaste distend distill distinct
distinguish distort distract distraught distress distribute
distribution district distrust disturb ditch dither ditto ditty divan
dive diverge diverse diversity divert divest divide dividend divine
division divisive divorce divulge dizzy dock docket doctor doctrine
document dodge doe dog dogged dogma doldrums dole doll dollar dolphin
domain dome domestic domicile dominant dominate domineer dominion
domino don donate donkey donor doom door doorstep doorway dope dormant
dormitory dosage dose dossier dot dote double doubt dough doughnut
dour douse dove dowdy dowel down downcast downfall downgrade downhill
download downpour downright downstairs downtown downward dowry doze
dozen drab draft drag dragon dragonfly drain drake drama dramatic
drape drastic draw drawback drawbridge drawer drawing drawl dread
dreadful dream dreary dredge dregs drench dress dresser dribble drift
drill drink drip drive drivel driver driveway drizzle droll drone
drool droop drop drought drove drown drowsy drudge drug drum drunk
drunkard dry dual dub dubious duchess duck duct dud dude due duel duet
duffel dugout duke dull dumb dumbfound dummy dump dumpling dunce dune
dung dungeon dunk dupe duplex duplicate durable duration duress during
dusk dust duty dwarf dwell dwindle dye dynamic dynamite dynamo dynasty
dysentery each eager eagle ear earl early earn earnest earring earth
earthquake ease easel east easter eastern easy eat eave ebb ebony
eccentric echelon echo eclipse ecology economic economy ecstasy eddy
edge edible edict edifice edit edition editor editorial educate
education eel eerie efface effect effective effeminate effervescent
efficacy efficiency efficient effigy effort effrontery egalitarian egg
ego egotism eight either eject elaborate elapse elastic elated elbow
elder elect election electric electricity electrode electron
electronic elegant elegy element elementary elephant elevate elevator
elicit eligible eliminate elite elixir elk ellipse elm elongate elope
eloquent else elsewhere elucidate elude elusive emaciated emanate
emancipate embalm embankment embargo embark embarrass embassy embed
embellish ember embezzle emblem embody embrace embroider embroil
embryo emerald emerge emergency emeritus emigrate eminent emissary
emission emit emotion emotional emperor emphasis emphasize empire
empirical employ employee employer employment emporium empower empress
empty emulate enable enact enamel enamor encamp encase enchant
encircle enclave enclose encompass encore encounter encourage encroach
encumber encyclopedia end endanger endear endeavor endemic endless
endorse endow endure enema enemy energetic energy enforce engage
engender engine engineer english engrave engross engulf enhance enigma
enjoy enlarge enlighten enlist enliven enmity enormous enough enrage
enrich enroll ensemble enshrine ensign enslave ensue ensure entail
entangle enter enterprise entertain enthrall enthusiasm enthusiastic
entice entire entitle entity entourage entrails entrance entreat
entrench entrepreneur entrust entry enumerate enunciate envelop
envelope envious environment environmental envisage envision envoy
envy enzyme epaulet ephemeral epic epidemic epigram epilepsy epilogue
episode epitaph epithet epitome epoch equal equanimity equate equation
equator equestrian equilibrium equinox equip equipment equitable
equity equivalent equivocal era eradicate erase erect erode erosion
erotic err errand erratic erroneous error erudite erupt escalate
escapade escape eschew escort esoteric especially espionage espouse
essay essence essential establish establishment estate esteem estimate
estranged estuary etch eternal eternity ether ethereal ethic ethical
ethnic etiquette eulogy euphemism euphoria evacuate evade evaluate
evangelist evaporate evasive eve even evening event eventual ever
evergreen every everybody everyday everyone everything everywhere
evict evidence evident evil evoke evolve ewe exacerbate exact
exaggerate exalt exam examination examine example exasperate excavate
exceed excel excellence excellent except exception excerpt excess
exchange excise excite exclaim exclude exclusive excrement
excruciating excursion excuse execute executive exemplary exemplify
exempt exercise exert exhale exhaust exhibit exhibition exhilarate
exhort exile exist existence exit exodus exonerate exorbitant exorcise
exotic expand expanse expansion expatriate expect expectation
expedient expedition expel expend expense expensive experience
experiment expert expertise expire explain explanation expletive
explicit explode exploit explore explosion explosive exponent export
expose exposure expound express expression expulsion exquisite extant
extemporaneous extend extension extensive extent extenuate exterior
exterminate external extinct extinguish extol extort extra extract
extradite extraneous extraordinary extravagant extreme extremity
extricate extrovert exuberant exude exult eye eyebrow eyelash fable
fabric fabricate fabulous facade face facet facetious facial facile
facilitate facility facsimile fact faction factor factory factual
faculty fad fade fag fahrenheit fail failure faint fair fairy faith
fake falcon fall fallacy fallow false falsetto falsify falter fame
familiar family famine famish famous fan fanatic fancy fanfare fang
fantastic fantasy far farce fare farewell farm farmer fascinate
fascism fashion fast fasten fastidious fat fatal fate father fathom
fatigue fatten faucet fault fauna favor favorite fawn fear fearful
feasible feast feat feather feature february feckless federal
federation fee feeble feed feedback feel feign feint feline fell
fellow fellowship felon felony felt female feminine fen fence fend
fender ferment fern ferocious ferret ferry fertile fertilize fervent
fervor fester festival festive fetch fete fetish fetter feud feudal
fever few fiance fiasco fib fiber fickle fiction fiddle fidelity
fidget field fiend fierce fiery fiesta fifteen fifth fifty fig fight
figment figure filament filch file filial filibuster filigree fill
fillet filly film filter filth fin final finale finance financial
finch find fine finesse finger fingernail fingerprint finish finite
fir fire firefly fireman fireplace fireproof firewood firework firm
firmament first fiscal fish fisherman fissure fist fit fitful fitness
five fix fixture fizz fjord flabby flag flagon flagrant flail flair
flake flamboyant flame flamingo flammable flank flannel flap flare
flash flashlight flask flat flatten flatter flaunt flavor flaw flax
flea fleck flee fleece fleet flesh flex flexible flick flicker flight
flimsy flinch fling flint flip flippant flirt flit float flock floe
flog flood floor flop floral florid florist flotilla flounce flounder
flour flourish flout flow flower flu fluctuate flue fluent fluff fluid
fluke flunk fluorescent fluoride flurry flush fluster flute flutter
flux fly foal foam focal focus fodder foe fog foible foil foist fold
foliage folio folk folklore follow folly foment fond fondle font food
fool foolish foot footage football foothill foothold footing footnote
footpath footprint footstep for forage foray forbear forbid force ford
forearm forebear foreboding forecast forefather forefinger forefront
forego foreground forehead foreign foreigner foreman foremost forensic
forerunner foresee foreshadow foresight forest forestall foretell
forever forfeit forge forget forgive forgo fork forlorn form formal
format formation former formidable formula formulate forsake fort
forte forth forthcoming forthright fortify fortitude fortnight
fortress fortuitous fortunate fortune forty forum forward fossil
foster foul found foundation founder foundry fountain four fourteen
fourth fowl fox foyer fracas fraction fracture fragile fragment
fragrance fragrant frail frame franchise frank frankfurter frantic
fraternal fraternity fraud fraught fray freak freckle free freedom
freeway freeze freight frenzy frequency frequent fresh freshen
freshman fret friar friction friday fridge friend friendly friendship
frieze frigate fright frighten frigid frill fringe frisk fritter
frivolous frock frog frolic from front frontier frost frostbite froth
frown frugal fruit fruition frustrate fry fudge fuel fugitive fulcrum
fulfill full fumble fume fumigate fun function fund fundamental
funeral fungus funnel funny fur furious furl furlough furnace furnish
furniture furor furrow further furtive fury fuse fuselage fusion fuss
futile future fuzz gab gabardine gable gadget gag gaiety gain gait
gala galaxy gale gall gallant gallery galley gallon gallop gallows
galore galvanize gambit gamble gambol game gamut gander gang gangrene
gangster gantry gap gape garage garb garbage garble garden gardenia
gargle gargoyle garish garland garlic garment garner garnet garnish
garret garrison garrulous garter gas gash gasket gasoline gasp gastric
gate gather gaudy gauge gaunt gauntlet gauze gavel gawk gay gaze
gazelle gazette gear gelatin gem gender gene general generate
generation generator generic generous genesis genetic genial genius
genre genteel gentle gentleman gentry genuine genus geography geology
geometry geranium gerbil germ germane germinate gestation gesticulate
gesture get geyser ghastly gherkin ghetto ghost ghoul giant gibberish
gibe giddy gift gig gigantic giggle gild gill gilt gimmick gin ginger
gingham giraffe girder girdle girl girth gist give glacier glad glade
gladiator glamour glance gland glare glass glaze gleam glean glee glen
glib glide glimmer glimpse glint glisten glitter gloat globe gloom
glorify glorious glory gloss glossary glove glow glucose glue glum
glut glutton gnarl gnash gnat gnaw gnome goad goal goat gobble goblet
goblin god goddess goggles gold golden goldfish golf gondola gong good
goodbye goodness goods goose gopher gore gorge gorgeous gorilla gory
gosling gospel gossamer gossip gouge gourd gourmet gout govern
governess government governor gown grab grace gracious grade gradient
gradual graduate graffiti graft grain gram grammar granary grand
grandeur grandfather grandiose grandmother granite grant granule grape
grapefruit graph graphic grapple grasp grass grasshopper grate
grateful gratify gratitude gratuity grave gravel gravitate gravity
gravy gray graze grease great greed green greet gregarious grenade
greyhound grid griddle grief grievance grieve grill grim grimace grime
grin grind grip gripe grisly grist grit grizzly groan grocer grocery
groggy groin groom groove grope gross grotesque grotto grouch ground
group grouse grove grovel grow growl growth grub grudge gruel gruesome
gruff grumble grumpy grunt guarantee guard guardian guerrilla guess
guest guffaw guidance guide guild guile guillotine guilt guilty guinea
guise guitar gulch gulf gull gullible gully gulp gum gumption gun
gunpowder gurgle guru gush gust gusto gut gutter guy guzzle gym
gymnasium gymnast gypsum gyrate gyroscope habit habitat hack haddock
haggard haggle hail hair haircut hale half hall hallmark hallow
hallucinate hallway halo halt halter halve ham hamburger hamlet hammer
hammock hamper hamster hand handbag handbook handcuff handful handicap
handkerchief handle handout handshake handsome handy hang hangar
hanger hanker haphazard hapless happen happiness happy harangue harass
harbinger harbor hard harden hardly hardship hardware hardy hare harem
hark harlequin harm harmonica harmony harness harp harpoon harrow
harry harsh harvest hash hassle haste hasten hasty hat hatch hatchet
hate hateful hatred haughty haul haunch haunt have haven havoc hawk
hay hayloft hazard haze hazel head headache header headline headlong
headquarters headstrong headway heal health healthy heap hear hearing
hearken hearse heart hearten hearth hearty heat heath heathen heather
heave heaven heavy heckle hectic hedge hedgehog heed heel hefty heifer
height heighten heinous heir heirloom helicopter helium hell hello
helm helmet help helpful hem hemisphere hemlock hemorrhage hemp hen
hence henchman herald herb herd here hereditary heredity heresy
heretic heritage hermit hero heroic heroin heroine heron herring
hesitant hesitate heterogeneous hew hexagon heyday hiatus hibernate
hiccup hickory hidden hide hideous hierarchy high highland highlight
highway hijack hike hilarious hill hilt hind hinder hindrance
hindsight hinge hint hip hippopotamus hire hiss historian historic
historical history hit hitch hive hoard hoarse hoax hobble hobby hobo
hock hockey hoe hog hoist hold hole holiday hollow holly holocaust
holster holy homage home homely homestead homework homicide
homogeneous hone honest honey honeymoon honk honor hood hoodlum hoof
hook hooligan hoop hoot hop hope hopeful horde horizon horizontal
hormone horn hornet horoscope horrendous horrible horrid horrify
horror horse horticulture hose hospitable hospital host hostage hostel
hostile hot hotel hound hour house household housewife housing hovel
hover how however howl hub hubbub huddle hue huff hug huge hulk hull
hum human humane humanity humble humdrum humid humiliate humility
humor hump hunch hundred hunger hungry hunk hunt hunter hurdle hurl
hurricane hurry hurt hurtle husband hush husk husky hustle hut hutch
hybrid hydrant hydraulic hydrogen hyena hygiene hymn hyphen hypnosis
hypnotize hypochondriac hypocrisy hypocrite hypothesis hysteria
hysterical ice iceberg icicle icing icon icy idea ideal identical
identification identify identity ideology idiom idiosyncrasy idiot
idle idol idolize idyllic igloo ignite ignition ignoble ignominious
ignoramus ignorance ignorant ignore iguana ill illegal illegible
illegitimate illicit illiterate illness illogical illuminate illusion
illustrate illustrious image imagination imagine imbecile imbibe imbue
imitate immaculate immaterial immature immediate immense immerse
immigrant immigration imminent immobile immoral immortal immune
immutable imp impact impair impale impart impartial impasse
impassioned impatient impeach impeccable impede impediment impel
impending imperative imperceptible imperfect imperial imperil
imperious impersonal impersonate impertinent impervious impetuous
impetus impinge implant implement implicate implication implicit
implore imply impolite import importance important importune impose
imposition impossible impostor impotent impound impoverish impregnable
impress impression impressive imprint imprison improbable impromptu
improper improve improvement improvise imprudent impudent impulse
impunity impure inadvertent inane inanimate inaugurate incandescent
incantation incapacitate incarcerate incarnate incendiary incense
incentive inception incessant inch incident incidental incinerate
incipient incise incite incline include incognito incoherent income
incongruous inconvenience incorporate incorrigible increase incredible
incredulous increment incriminate incubate incumbent incur indebted
indeed indefatigable indelible indemnity indent independence
independent index indicate indication indicator indict indifferent
indigenous indigent indigestion indignant indigo indirect indiscreet
indiscriminate indispensable individual indoctrinate indolent
indomitable indoor induce induct indulge industrial industrious
industry inebriated inept inert inevitable inexorable infallible
infamous infancy infant infantry infatuate infect infection infer
inferior infernal inferno infest infidel infiltrate infinite infinity
infirm inflame inflate inflation inflection inflict influence
influential influenza influx inform informal informant information
infraction infrastructure infringe infuriate infuse ingenious
ingenuous ingest ingot ingrained ingratiate ingredient inhabit
inhabitant inhale inherent inherit inhibit inhuman inimitable iniquity
initial initiate initiative inject injunction injure injury ink
inkling inlaid inland inlet inmate inn innate inner inning innocence
innocent innocuous innovate innovation innuendo inoculate inordinate
input inquest inquire inquiry inquisitive insane insatiable inscribe
insect insecticide insert inside insidious insight insignia insinuate
insipid insist insolent insomnia inspect inspector inspire install
instance instant instead instigate instill instinct institute
institution instruct instruction instrument insufferable insufficient
insular insulate insulin insult insurance insure insurgent
insurrection intact intake integer integral integrate integrity
intellect intellectual intelligence intelligent intend intense
intensity intensive intent intention inter interact interaction
intercede intercept interchange intercourse interest interesting
interface interfere interim interior interject interlude intermediate
intermission intermittent intern internal international internet
interpose interpret interpretation interrogate interrupt intersect
intersection intersperse interval intervene intervention interview
intestine intimate intimidate intolerable intone intoxicate
intractable intransigent intrepid intricate intrigue intrinsic
introduce introduction introspection introvert intrude intuition
inundate invade invalid invaluable invariable invasion invective
inveigh invent invention inventory inverse invert invest investigate
investigation investment investor inveterate invigorate invincible
invisible invitation invite invoice invoke involve involvement
invulnerable inward iodine ion iota irate ire iridescent iris irk iron
ironic irony irrational irregular irrelevant irreparable irresistible
irreverent irrevocable irrigate irrigation irritate island isle
isolate isolation isotope issue isthmus italic itch item itemize
itinerant itinerary ivory ivy jab jabber jack jackal jackass jacket
jackpot jade jagged jaguar jail jalopy jam jangle janitor january jar
jargon jasmine jasper jaundice jaunt javelin jaw jay jazz jealous
jeans jeep jeer jelly jellyfish jeopardy jerk jersey jest jester jet
jettison jetty jewel jeweler jewelry jib jibe jiffy jig jiggle jilt
jingle jinx jitters job jockey jocular jog join joint joke joker jolly
jolt jostle jot journal journalism journalist journey jovial jowl joy
joyful joyous jubilant jubilee judge judgment judicial judicious judo
jug juggle juice juicy jukebox july jumble jumbo jump junction
juncture june jungle junior juniper junk junket junta jurisdiction
juror jury just justice justify jut jute juvenile juxtapose
kaleidoscope kangaroo karate kayak keel keen keep keepsake keg kelp
ken kennel kerchief kernel kerosene ketchup kettle key keyboard
keynote keystone khaki kick kid kidnap kidney kill kiln kilo kilogram
kilometer kilt kimono kin kind kindergarten kindle kindred kinetic
king kingdom kink kiosk kiss kit kitchen kite kitten knack knapsack
knave knead knee kneel knell knickers knife knight knit knob knock
knoll knot know knowledge knuckle koala kosher kudos label labor
laboratory labyrinth lace lacerate lack lackey lacquer lad ladder
laden ladle lady lag lagoon lair lake lamb lame lament laminate lamp
lampoon lance land landlord landmark landscape landslide lane language
languid languish lanky lantern lap lapel lapse larceny larch lard
large lark larva larynx lascivious laser lash lass lasso last latch
late lately latent later lateral lathe lather latitude latter lattice
laud laugh laughter launch launder laundry laurel lava lavatory
lavender lavish law lawn lawsuit lawyer lax laxative lay layer layman
layout lazy lead leader leadership leaf league leak lean leap learn
lease leash least leather leave lecture ledge ledger leech leek leer
leeway left leg legacy legal legend legible legion legislate
legislation legislature legitimate leisure lemon lemonade lend length
lengthen lenient lens lentil leopard leper leprosy lesion less lessen
lesson lest let lethal lethargy letter lettuce levee level lever
leverage levity levy lewd lexicon liability liable liaison liar libel
liberal liberate liberty library license lichen lick lid lie lien lieu
lieutenant life lifeboat lifeguard lifelong lifestyle lifetime lift
ligament light lighten lighthouse lightning like likely liken likeness
likewise lilac lilt lily limb limber limbo lime limelight limerick
limestone limit limitation limousine limp limpid line lineage linear
linen liner linger lingerie linguist linguistic liniment link linoleum
lint lion lip liquid liquidate liquor lisp list listen listless
literacy literal literary literate literature lithe litigation litter
little liturgy live livelihood lively liver livestock livid living
lizard load loaf loan loathe lobby lobe lobster local locale locate
location lock locker locket locomotive locust lodge loft lofty log
logic logical logo loin loiter loll lollipop lone lonely lonesome long
longevity longitude look loom loop loophole loose loosen loot lop lope
lopsided loquacious lord lore lose loss lost lot lotion lottery lotus
loud lounge louse lout love lovely lover low lower loyal loyalty
lozenge lubricate lucid luck lucky lucrative ludicrous lug luggage
lukewarm lull lullaby lumber luminous lump lunacy lunar lunatic lunch
luncheon lung lunge lurch lure lurid lurk luscious lush lust luster
lusty lute luxuriant luxury lying lymph lynch lynx lyre lyric macabre
macaroni machete machine machinery mackerel mad madam madden madrigal
maelstrom maestro magazine maggot magic magician magistrate
magnanimous magnate magnesium magnet magnetic magnificent magnify
magnitude magnolia magpie mahogany maid maiden mail maim main mainland
mainstay mainstream maintain maintenance maize majesty major majority
make maker malady malaise malaria male malevolent malice malign
malignant mall mallard malleable mallet malnutrition malpractice malt
mammal mammoth man manacle manage management manager mandate mandatory
mandolin mane maneuver mangle mango mangy manhandle manhole manhood
mania maniac manicure manifest manifesto manifold manipulate mankind
manner mannerism mansion mantel mantle manual manufacture manufacturer
manure manuscript many map maple mar marathon maraud marble march mare
margarine margin marigold marina marinate marine mariner marionette
marital maritime mark market marketing marksman marmalade maroon
marquee marriage marrow marry marsh marshal marsupial mart martial
martin martyr marvel marvelous mascot masculine mash mask mason
masquerade mass massacre massage massive mast master masterpiece
mastery mastiff mat matador match mate material maternal maternity
math mathematics matinee matriarch matrimony matrix matron matter
mattress mature maudlin maul mausoleum maverick maxim maximum may
maybe mayhem mayonnaise mayor maze meadow meager meal mean meander
meaning meantime meanwhile measles measure meat mechanic mechanical
mechanism medal meddle media mediate medical medicine medieval
mediocre meditate medium medley meek meet meeting megaphone melancholy
mellow melodrama melody melon melt member membership membrane memento
memo memoir memorandum memorial memory menace menagerie mend menial
meningitis menopause mental mention mentor menu mercantile mercenary
merchandise merchant mercury mercy mere merge merger meridian merit
mermaid merry mesh mesmerize mess message messenger metabolism metal
metamorphosis metaphor mete meteor meter method meticulous metric
metropolis metropolitan mettle mice microbe microphone microscope
midday middle midget midnight midst midway midwife mien might mighty
migraine migrant migrate migration mild mildew mile mileage milestone
militant military militia milk mill millennium miller millet milliner
million millionaire mime mimic minaret mince mind mine miner mineral
mingle miniature minimal minimize minimum minion minister ministry
mink minnow minor minority minstrel mint minuet minus minute miracle
mirage mire mirror mirth misadventure misanthrope misapprehension
miscarriage miscellaneous mischief misconception misconduct miscreant
misdemeanor miser miserable misery misfit misfortune misgiving mishap
misinterpret mislay mislead misnomer misplace misprint miss missile
mission missionary missive mist mistake mister mistletoe mistress
mistrust misty misunderstand misuse mite mitigate mitten mix mixture
moan moat mob mobile mobilize moccasin mock mockery mode model
moderate modern modernize modest modicum modify modulate module mohair
moist moisten moisture molar molasses mold molecule molest mollify
mollusk molt molten moment momentous momentum monarch monastery monday
monetary money mongrel monitor monk monkey monogram monologue
monopolize monopoly monotonous monotony monsoon monster month monument
mood moody moon moonlight moor moose mop mope moral morale morass
moratorium morbid more moreover morgue morning moron morose morphine
morrow morsel mortal mortar mortgage mortician mortify mortuary mosaic
mosque mosquito moss most motel moth mother motif motion motivate
motive motley motor motorcycle motorist mottle motto mound mount
mountain mountaineer mourn mouse mousse mouth move movement movie mow
much muck mucus mud muddle muff muffin muffle mug mulberry mulch mule
mull multiple multiply multitude mumble mummy mumps munch mundane
municipal munitions mural murder murky murmur muscle muse museum mush
mushroom music musical musician musket muslin mussel must mustache
mustang mustard muster musty mutate mute mutilate mutiny mutter mutton
mutual muzzle myopia myriad myrtle mystery mystic mystify myth nab
nadir nag nail naive name namely namesake nanny nap napkin narcissus
narcotic narrate narrative narrow nasal nasty nation national native
nativity natural nature naught naughty nausea nautical naval nave
navel navigate navy near nearby nearly neat nebula nebulous necessary
necessity neck necklace necktie nectar need needle needless needy
nefarious negate negative neglect negligee negligent negotiate
negotiation neigh neighbor neighborhood neither nemesis neon nephew
nepotism nerve nervous nest nestle net nettle network neural neurosis
neurotic neuter neutral never nevertheless new news newspaper next
nibble nice niche nick nickel nickname nicotine niece nifty niggardly
night nightingale nightmare nil nimble nine nineteen ninety nip nipple
nitrogen noble nobody nocturnal nod node noise noisy nomad nominal
nominate nomination nonchalant nondescript none nonetheless nonsense
noodle nook noon noose nor norm normal north northeast northern
northwest nose nostalgia nostril notable notary notation notch note
nothing notice notify notion notorious noun nourish novel novelty
november novice now nowhere noxious nozzle nuance nuclear nucleus nude
nudge nugget nuisance null nullify numb number numeral numerical
numerous nun nuptial nurse nursery nurture nut nutmeg nutrient
nutrition nuzzle nylon nymph oaf oak oar oasis oat oath obedient
obelisk obese obey obituary object objective obligate obligation
oblige oblique obliterate oblivion oblong obnoxious oboe obscene
obscure obsequious observation observatory observe observer obsess
obsolete obstacle obstetrics obstinate obstruct obtain obtrusive
obtuse obviate obvious occasion occasional occult occupant occupation
occupy occur occurrence ocean octagon octave october octopus oculist
odd odds ode odious odor odyssey off offend offense offensive offer
offhand office officer official officiate officious offset offshoot
offspring often ogle ogre ohm oil ointment okay old olive omelet omen
ominous omit omnibus omnipotent once one onerous ongoing onion online
onlooker only onset onslaught onto onus onward ooze opal opaque open
opera operate operation operative operator opinion opium opossum
opponent opportune opportunity oppose opposite opposition oppress opt
optic optical optician optimism optimistic optimum option optional
optometrist opulent oracle oral orange orangutan oration orator orb
orbit orchard orchestra orchid ordain ordeal order ordinal ordinance
ordinary ordination ore organ organic organism organization organize
orgy orient orientation orifice origin original originate oriole
ornament ornate ornery ornithology orphan orthodox oscillate osprey
ostensible ostentatious ostracize ostrich other otherwise otter ought
ounce oust out outbreak outburst outcast outcome outcry outdo outdoor
outer outfit outgoing outgrow outing outlandish outlaw outlay outlet
outline outlive outlook outnumber output outrage outright outset
outside outskirts outspoken outstanding outward outwit oval ovation
oven over overall overbearing overboard overcast overcoat overcome
overdo overdue overflow overhaul overhead overhear overlap overlook
overnight overpower overrate override overrule overrun overseas
oversee overshadow oversight oversleep overt overtake overthrow
overtime overture overturn overwhelm overwrought owe owl own owner
ownership oxide oxygen oyster ozone pace pacify pack package packet
pact pad paddle paddock padlock pagan page pageant pagoda pail pain
painful paint painter painting pair pajamas pal palace palatable
palate pale palette pall pallbearer pallid pallor palm palpable
palpitate palsy paltry pamper pamphlet pan panacea pancake pancreas
panda pandemonium pander pane panel pang panic panorama pansy pant
panther pantomime pantry pants papacy paper paprika papyrus par
parable parabola parachute parade paradigm paradise paradox paraffin
paragon paragraph parakeet parallel paralysis paralyze paramount
paranoia parapet paraphernalia paraphrase parasite parasol parcel
parch parchment pardon pare parent parenthesis pariah parish parity
park parka parley parliament parlor parochial parody parole parquet
parrot parry parse parsley parsnip parson part partake partial
participant participate participation participle particle particular
partisan partition partly partner partnership partridge party pass
passage passenger passion passive passport password past pasta paste
pastel pasteurize pastime pastor pastoral pastry pasture pat patch
patent paternal path pathetic pathology pathos patience patient patio
patriarch patrician patrimony patriot patrol patron patronage
patronize patter pattern paucity paunch pauper pause pave pavement
pavilion paw pawn pay payment pea peace peaceful peach peacock peak
peal peanut pear pearl peasant peat pebble pecan peck peculiar
pedagogue pedal pedant peddle pedestal pedestrian pedigree peek peel
peep peer peeve peg pelican pellet pelt pelvis pen penal penalize
penalty penance penchant pencil pendant pending pendulum penetrate
penguin penicillin peninsula penitent penitentiary pennant penny
pension pensive pentagon penthouse people pep pepper peppermint per
perambulate perceive percent percentage perception perch percolate
percussion perdition peremptory perennial perfect perfidy perforate
perform performance perfume perfunctory perhaps peril perimeter period
periodical peripheral periphery periscope perish perjury perk
permanent permeate permission permit pernicious peroxide perpendicular
perpetrate perpetual perpetuate perplex persecute persevere persist
person personal personality personnel perspective perspicacious
perspire persuade pert pertain pertinent perturb peruse pervade
perverse pervert pessimism pest pester pesticide pestilence pestle pet
petal petite petition petrify petrol petroleum petticoat petty
petulant pew pewter phantom pharmacy phase pheasant phenomenal
phenomenon philanthropy philosopher philosophy phlegm phobia phoenix
phone phonetic phonograph phony phosphate photo photograph
photographer phrase physical physician physics physiology physique
piano piazza pick picket pickle picnic pictorial picture picturesque
pie piece pier pierce piety pig pigeon pigment pike pile pilfer
pilgrim pilgrimage pill pillage pillar pillow pilot pimple pin
pinafore pincers pinch pine pineapple pinion pink pinnacle pinpoint
pint pioneer pious pipe pipeline piper piquant pique piracy pirate
pirouette pistol piston pit pitch pitcher pitchfork piteous pitfall
pith pitiful pittance pity pivot pixel pixie pizza placard placate
place placid plagiarism plague plaid plain plaintiff plaintive plan
plane planet plank plankton plant plantation plaque plasma plaster
plastic plate plateau platform platinum platitude platoon platter
plausible play player playful playground playwright plaza plea plead
pleasant please pleasure pleat pledge plentiful plenty pliable pliers
plight plod plot plow ploy pluck plug plum plumage plumb plumber plume
plummet plump plunder plunge plural plus plush ply plywood pneumonia
poach pocket pod poem poet poetry poignant poinsettia point poise
poison poke poker polar pole polemic police policy polish polite
politic political politician politics polka poll pollen pollute
pollution polo polygamy polygon pomp pompous poncho pond ponder
ponderous pony poodle pool poor pop popcorn pope poplar poppy populace
popular populate population porcelain porch porcupine pore pork porous
porpoise porridge port portable portal portend portent porter
portfolio porthole portico portion portly portrait portray pose
position positive posse possess possession possibility possible post
postage postal poster posterior posterity postman postpone posture pot
potato potent potentate potential pothole potion potpourri potter
pottery pouch poultice poultry pounce pound pour pout poverty powder
power powerful practical practice pragmatic prairie praise prance
prank prattle prawn pray prayer preach preamble precarious precaution
precede precedent precept precinct precious precipice precipitate
precise preclude precocious precursor predator predatory predecessor
predicament predicate predict prediction predilection predispose
predominant preeminent preempt preen prefabricate preface prefer
preference prefix pregnant prehistoric prejudice prelate preliminary
prelude premature premeditate premier premise premium premonition
preoccupy preparation prepare preponderance preposition preposterous
prerequisite prerogative presage prescribe prescription presence
present preservation preserve preside presidency president press
pressure prestige presume presumptuous pretend pretense pretext pretty
pretzel prevail prevalent prevaricate prevent preview previous prey
price prick pride priest prim primary primate prime primer primeval
primitive primrose prince princess principal principle print prior
priority prism prison prisoner pristine privacy private privilege
privy prize probable probably probate probation probe problem
procedure proceed process procession proclaim proclivity procrastinate
procure prod prodigal prodigious prodigy produce producer product
production productive profane profess profession professional
professor proffer proficient profile profit profound profuse progeny
prognosis program progress progressive prohibit project projectile
proletariat proliferate prolific prologue prolong promenade prominent
promiscuous promise promontory promote promotion prompt promulgate
prone prong pronoun pronounce proof prop propaganda propagate propel
propensity proper property prophecy prophet propitious proponent
proportion proposal propose proposition proprietor propriety
propulsion prosaic proscribe prose prosecute prospect prosper
prosperity prostitute prostrate protagonist protect protection protein
protest protocol prototype protract protrude proud prove proverb
provide providence province provision proviso provoke prow prowess
prowl proximity proxy prude prudent prune pry psalm pseudonym psyche
psychiatry psychology pub puberty public publication publicity publish
publisher pucker pudding puddle pudgy puerile puff pugnacious pull
pulley pulp pulpit pulsate pulse pulverize puma pummel pump pumpkin
pun punch punctilious punctual punctuate puncture pundit pungent
punish punishment punitive punt puny pup pupil puppet puppy purchase
pure purgatory purge purify puritan purple purport purpose purr purse
pursue pursuit purvey push pushy put putrid putter putty puzzle pygmy
pylon pyramid pyre python quack quadrangle quadrant quadruped
quadruple quaff quagmire quail quaint quake qualify quality qualm
quandary quantity quarantine quarrel quarry quart quarter quartet
quartz quash quaver quay queasy queen queer quell quench query quest
question queue quibble quick quicken quicksand quiet quill quilt
quince quinine quintet quip quirk quit quite quiver quiz quizzical
quorum quota quotation quote quotient rabbi rabbit rabble rabid
raccoon race rack racket radar radiant radiate radiation radiator
radical radio radish radius raffle raft rafter rag rage ragged raid
rail railing railroad railway rain rainbow raincoat raise raisin rake
rally ram ramble ramification ramp rampage rampant rampart ramshackle
ranch rancid rancor random range ranger rank rankle ransack ransom
rant rap rapacious rapid rapier rapport rapt rapture rare rascal rash
rasp raspberry rat rate rather ratify ratio ration rational rationale
rattle raucous ravage rave ravel raven ravenous ravine ravish raw ray
rayon raze razor reach react reaction read reader ready real realism
realistic reality realize realm ream reap rear reason reasonable
rebate rebel rebellion rebuff rebuke rebut recalcitrant recall recant
recapitulate recede receipt receive receiver recent receptacle
reception recess recession recipe recipient reciprocal recite reckless
reckon reclaim recline recluse recognition recognize recoil recollect
recommend recompense reconcile recondite reconnaissance reconsider
record recount recoup recourse recover recovery recreation
recrimination recruit rectangle rectify rectitude rector recumbent
recuperate recur recycle red redeem redemption redolent redoubtable
redound redress reduce reduction redundant reed reef reek reel
refectory refer referee reference referendum refine reflect reflection
reflex reform refraction refrain refresh refrigerate refuge refugee
refund refurbish refusal refuse refute regain regal regale regalia
regard regardless regatta regenerate regent regime regiment region
regional register registrar regret regular regulate regulation
regurgitate rehabilitate rehearse reign reimburse rein reindeer
reinforce reinstate reiterate reject rejoice rejoinder rejuvenate
relapse relate relation relationship relative relax relay release
relegate relent relevant reliable relic relief relieve religion
religious relinquish relish reluctant rely remain remainder remark
remarkable remedy remember remind reminisce remiss remit remnant
remonstrate remorse remote removal remove remunerate renaissance rend
render rendezvous rendition renegade renege renew renounce renovate
renown rent repair reparation repartee repast repatriate repeal repeat
repel repent repertoire repertory repetition replace replenish replete
replica reply report reporter repose repository reprehensible
represent representation representative repress reprieve reprimand
reprisal reproach reprobate reproduce reproof reprove reptile republic
repudiate repugnant repulse reputable reputation repute request
requiem require requirement requisite requisition requite rescind
rescue research researcher resemble resent reservation reserve
reservoir reside residence resident residue resign resignation
resilient resin resist resistance resolute resolution resolve resonant
resort resound resource respect respective respiration respite
resplendent respond response responsibility responsible rest
restaurant restitution restive restore restrain restraint restrict
restriction result resume resurgence resurrect resuscitate retail
retain retaliate retard retch reticent retina retinue retire
retirement retort retract retreat retrench retribution retrieve
retroactive retrograde retrospect return reunion revamp reveal
reveille revel revelation revenge revenue reverberate revere reverence
reverie reverse revert review revile revise revival revive revoke
revolt revolution revolutionary revolve revolver revue revulsion
reward rhapsody rhetoric rheumatism rhinoceros rhubarb rhyme rhythm
rib ribald ribbon rice rich rickety ricochet rid riddle ride rider
ridge ridicule ridiculous rife rifle rift rig right righteous rigid
rigmarole rigor rigorous rile rim rind ring rinse riot rip ripe ripen
ripple rise risk rite ritual rival river rivet roach road roam roan
roar roast rob robe robin robot robust rock rocket rod rodent rodeo
rogue roil role roll romance romantic romp roof rook rookie room roost
rooster root rope rosary rose roster rostrum rosy rot rotate rote
rotor rotten rotund rouge rough roulette round rouse rout route
routine rove rover row rowdy royal royalty rub rubber rubbish rubble
ruby rudder ruddy rude rudiment rue ruffian ruffle rug rugged ruin
rule ruler rum rumble ruminate rummage rumor rump rumple run rung
runner running rupture rural ruse rush russet rust rustic rustle rut
ruthless rye saber sable sabotage sac saccharin sachet sack sacrament
sacred sacrifice sacrilege sad sadden saddle sadism safari safe
safeguard safety saffron sag saga sagacious sage sail sailor saint
sake salad salamander salary sale salient saline saliva sallow sally
salmon salon saloon salt salutary salute salvage salvation salve same
sample sanatorium sanctify sanctimonious sanction sanctity sanctuary
sand sandal sandwich sane sanguine sanitary sanitation sanity sap
sapling sapphire sarcasm sardine sardonic sash satchel sate satellite
satiate satin satire satisfaction satisfy saturate saturday sauce
saucer saunter sausage savage save saving savior savor saw sawdust
saxophone say scab scabbard scaffold scald scale scallop scalp scalpel
scamp scamper scan scandal scant scapegoat scar scarce scare scarf
scarlet scathing scatter scavenger scenario scene scenery scent
scepter schedule scheme schism scholar scholarship scholastic school
schooner science scientific scientist scintillate scissors scoff scold
scoop scoot scope scorch score scorn scorpion scoundrel scour scourge
scout scowl scramble scrap scrape scratch scrawl scrawny scream
screech screen screw scribble scribe scrimmage script scripture scroll
scrounge scrub scruple scrutiny scuffle sculptor sculpture scum
scurrilous scurry scuttle scythe sea seal seam seaman seamstress sear
search season seat secede seclude second secret secretary secrete sect
section sector secular secure security sedan sedate sedative sediment
sedition seduce sedulous see seed seek seem seep seethe segment
segregate seismic seize seldom select selection self sell semblance
semester seminar seminary senate senator send senile senior sensation
sense sensible sensitive sensual sentence sentiment sentinel sentry
separate september sequel sequence sequester sequin serenade serene
serf sergeant serial series serious sermon serpent serrated serum
servant serve service servile servitude session set setback setting
settle settlement seven seventeen seventy sever several severe sew
sewage sewer sex sextant shabby shack shackle shade shadow shaft
shaggy shake shall shallow sham shamble shame shampoo shamrock shank
shanty shape share shareholder shark sharp sharpen shatter shave shawl
she sheaf shear sheath shed sheen sheep sheer sheet shelf shell
shelter shepherd sherbet sheriff sherry shield shift shilling shimmer
shin shine shingle ship shipment shipwreck shirk shirt shiver shoal
shock shoddy shoe shoot shop shore short shortage shorten shot should
shoulder shout shove shovel show shower shred shrew shrewd shriek
shrill shrimp shrine shrink shrivel shroud shrub shrug shudder shuffle
shun shunt shut shutter shuttle shy sibling sick sicken sickle side
sidewalk siege siesta sieve sift sigh sight sign signal signature
significance significant signify silence silent silhouette silk sill
silly silo silt silver similar simile simmer simple simplicity
simplify simply simulate simultaneous sin since sincere sinew sing
singe singer single singular sinister sink sinner sinuous sip siphon
sir sire siren sirloin sister sit site situate situation six sixteen
sixty size sizzle skate skeleton skeptic skeptical sketch skew skewer
ski skid skiff skill skillet skim skimp skin skip skipper skirmish
skirt skit skulk skull skunk sky skylark skyline skyscraper slab slack
slacken slag slake slam slander slang slant slap slash slat slate
slaughter slave slavery slay sled sledge sleek sleep sleet sleeve
sleigh sleight slender sleuth slice slick slide slight slim slime
sling slink slip slipper slippery slit slither sliver slogan sloop
slop slope slot sloth slouch slovenly slow sludge slug sluggish sluice
slum slumber slump slur slush sly smack small smart smash smattering
smear smell smelt smile smirk smite smith smock smog smoke smolder
smooth smother smudge smug smuggle snack snag snail snake snap snare
snarl snatch sneak sneer sneeze snicker sniff snip snipe snivel snob
snoop snooze snore snort snout snow snub snuff snug snuggle soak soap
soar sob sober sobriety soccer sociable social socialism society
sociology sock socket sod soda sodden sodium sofa soft soften software
soggy soil sojourn solace solar solder soldier sole solemn solicit
solicitous solid solidarity soliloquy solitary solitude solo solstice
soluble solution solve solvent somber some somebody somehow someone
somersault something sometime sometimes somewhat somewhere somnolent
son sonata song sonnet sonorous soon soot soothe sop sophisticated
sophomore soporific soprano sorcerer sordid sore sorghum sorority
sorrel sorrow sorry sort sortie soul sound soup sour source south
southeast southern southwest souvenir sovereign sovereignty sow space
spacious spade spaghetti span spangle spaniel spank spar spare spark
sparkle sparrow sparse spasm spat spate spatial spatter spatula spawn
speak speaker spear special specialist specialize species specific
specify specimen specious speck spectacle spectacular spectator
specter spectrum speculate speech speed spell spend sphere spice
spider spigot spike spill spin spinach spindle spine spinster spiral
spire spirit spiritual spit spite splash splendid splendor splice
splint splinter split spoil spoke spokesman sponge sponsor spontaneous
spool spoon sporadic sport spot spouse spout sprain sprawl spray
spread spree sprig spring sprinkle sprint sprout spruce spry spur
spurious spurn spurt sputter spy squabble squad squadron squalid
squall squander square squash squat squaw squawk squeak squeal
squeamish squeeze squelch squid squint squire squirm squirrel squirt
stab stability stabilize stable stack stadium staff stag stage stagger
stagnant staid stain stair staircase stake stale stalemate stalk stall
stallion stalwart stamina stammer stamp stampede stance stanch stand
standard standing stanza staple star starboard starch stare stark
start startle starve state stately statement statesman static station
stationary stationery statistic statue stature status statute staunch
stave stay steadfast steady steak steal stealth steam steed steel
steep steeple steer stellar stem stench stencil step stereotype
sterile sterling stern stethoscope stevedore stew steward stick
stickler sticky stiff stifle stigma stile stiletto still stilt
stimulant stimulate stimulus sting stingy stink stint stipend
stipulate stir stirrup stitch stock stockade stocking stoic stoke
stole stolid stomach stone stool stoop stop storage store stork storm
story stout stove stow straddle straggle straight straighten strain
strait strand strange stranger strangle strap stratagem strategic
strategy stratum straw strawberry stray streak stream street strength
strengthen strenuous stress stretch strew stricken strict stride
strident strife strike string stringent strip stripe strive stroke
stroll strong stronghold structural structure struggle strut stub
stubble stubborn stucco stud student studio study stuff stumble stump
stun stunt stupefy stupendous stupid stupor sturdy stutter sty style
stylish suave subdue subject subjective subjugate sublime submarine
submerge submit subordinate subpoena subscribe subsequent subservient
subside subsidiary subsidy subsist substance substantial substantiate
substitute subterfuge subterranean subtle subtract suburb subvert
subway succeed success successful succession successive successor
succinct succor succulent succumb such suck suction sudden suds sue
suede suffer suffice sufficient suffix suffocate suffrage sugar
suggest suggestion suicide suit suitable suitcase suite suitor sulfur
sulk sullen sultan sultry sum summary summer summit summon sumptuous
sun sundae sunday sunder sundry sunflower sunken sunny sunrise sunset
sunshine sup super superb supercilious superficial superfluous
superintendent superior superlative supermarket supernatural supersede
superstition supervise supervisor supine supper supplant supple
supplement suppliant supplicate supply support suppose suppress
supreme surcharge sure surf surface surfeit surge surgeon surgery
surly surmise surmount surname surpass surplus surprise surrender
surreptitious surrey surrogate surround surveillance survey survival
survive survivor susceptible suspect suspend suspense suspension
suspicion suspicious sustain sustenance swab swagger swallow swamp
swan swap swarm swarthy swat swath sway swear sweat sweater sweep
sweet sweeten swell swelter swerve swift swim swindle swine swing
swipe swirl switch swivel swoon swoop sword sycamore sycophant
syllable syllabus symbol symbolic symmetry sympathetic sympathy
symphony symptom synagogue synchronize syndicate syndrome synonym
synopsis syntax synthesis synthetic syringe syrup system systematic
tab tabernacle table tableau tablet taboo tabulate tacit taciturn tack
tackle tact tactic tactile tadpole taffeta taffy tag tail tailor taint
take talc tale talent talisman talk tall tallow tally talon tambourine
tame tamper tan tandem tang tangent tangerine tangible tangle tango
tank tankard tantalize tantamount tantrum tap tape taper tapestry tar
tardy target tariff tarnish tarpaulin tarry tart tartan task tassel
taste tatter tattle tattoo taunt taut tavern tawdry tawny tax taxi tea
teach teacher teak team teapot tear tease teaspoon technical
technician technique technology tedious teem teen teenager teeter
telegram telegraph telephone telescope television tell temerity temper
temperament temperance temperate temperature tempest temple tempo
temporal temporary tempt temptation ten tenable tenacious tenant tend
tendency tender tendon tendril tenement tenet tennis tenor tense
tension tent tentacle tentative tenuous tenure tepid term terminal
terminate terminology terminus termite terrace terrain terrestrial
terrible terrier terrific terrify territory terror terrorism terrorist
terse test testament testify testimonial testimony tether text
textbook textile texture than thank that thatch thaw theater theft
their theme then thence theology theorem theoretical theory therapy
there thereby therefore thermal thermometer thermos thesaurus thesis
they thick thicken thicket thief thigh thimble thin thing think third
thirst thirsty thirteen thirty this thistle thong thorn thorough those
though thought thousand thrash thread threadbare threat threaten three
thresh threshold thrift thrifty thrill thrive throat throb throe
throne throng throttle through throughout throw thrust thud thug thumb
thump thunder thursday thus thwart thyme tiara tick ticket tickle tide
tidings tidy tie tier tiff tiger tight tighten tile till tiller tilt
timber time timely timid tin tincture tinder tinge tingle tinker
tinkle tinsel tint tiny tip tirade tire tissue titanic tithe title
titter toad toast tobacco toboggan today toddle toe toffee toga
together toil toilet token tolerable tolerance tolerant tolerate toll
tomahawk tomato tomb tomorrow ton tone tongs tongue tonic tonight
tonnage tonsil too tool tooth top topaz topic topple torch toreador
torment tornado torpedo torpid torrent torrid torso tortilla tortoise
tortuous torture toss tot total totter touch touchy tough toughen tour
tourism tourist tournament tourniquet tousle tout tow toward towel
tower town toxic toxin toy trace track tract traction tractor trade
tradition traditional traffic tragedy tragic trail train trainer
training trait traitor trajectory tram tramp trample trance tranquil
transact transaction transcend transcribe transcript transfer
transfigure transfix transform transformation transfusion transgress
transient transit transition translate translation translucent
transmission transmit transom transparent transpire transplant
transport transportation transpose trap trapeze trash trauma travail
travel traverse travesty tray treacherous treachery tread treason
treasure treasury treat treatise treatment treaty treble tree trek
trellis tremble tremendous tremor tremulous trench trenchant trend
trepidation trespass tress trestle trial triangle tribe tribulation
tribunal tributary tribute trick trickle tricycle trident trifle
trigger trill trillion trilogy trim trinket trio trip triple triplet
tripod trite triumph trivial trolley trombone troop trophy tropic
tropical trot trouble trough trounce troupe trousers trout trowel
truant truce truck trudge true truism trump trumpet truncheon trunk
truss trust truth try tryst tub tuba tube tuberculosis tuck tuesday
tuft tug tuition tulip tumble tumor tumult tuna tundra tune tunic
tunnel turban turbine turbulent tureen turf turkey turmoil turn turnip
turnpike turpentine turquoise turret turtle tusk tussle tutor tuxedo
twang tweak tweed tweezers twelve twenty twice twig twilight twin
twine twinge twinkle twirl twist twitch twitter two tycoon type
typewriter typhoid typhoon typical typify typography tyranny tyrant
ubiquitous udder ugly ulcer ulterior ultimate ultimatum umbrage
umbrella umpire unanimous unassuming unbridled uncanny uncle uncouth
unction under undergo undergraduate underground underhand underline
undermine underneath understand understanding understudy undertake
undertow underwrite undulate unemployment unfold unfurl ungainly
unicorn uniform unify unilateral union unique unison unit unite unity
universal universe university unkempt unless unlike unruly until
unusual unwieldy upbraid upcoming update upgrade upheaval uphold
upholster upkeep uplift upon upper upright uprising uproar upset
upshot upstairs upstart urban urbane urchin urge urgent urn usage use
useful user usher usual usurp usury utensil utility utilize utmost
utter vacant vacate vacation vaccinate vaccine vacillate vacuum
vagabond vagary vagrant vague vain vale valedictory valentine valet
valiant valid validate validity valise valley valor valuable value
valve vampire van vandal vane vanguard vanilla vanish vanity vanquish
vantage vapid vapor variable variance variant variation varied
variegated variety various varnish vary vase vassal vast vat
vaudeville vault vaunt veal veer vegetable vegetarian vegetate
vehement vehicle veil vein vellum velocity velvet vendor veneer
venerable venerate vengeance venison venom vent ventilate ventricle
ventriloquist venture venue veracity veranda verb verbal verbatim
verbose verdant verdict verge verify verily veritable vermilion vermin
vernacular vernal versatile verse version versus vertebra vertex
vertical vertigo verve very vessel vest vestibule vestige veteran
veterinary veto vex viable viaduct vial viand vibrant vibrate vicar
vicarious vice vicinity vicious victim victor victory video view
viewer viewpoint vigil vigilant vignette vigor vigorous vile vilify
villa village villain vim vindicate vindictive vine vinegar vineyard
vintage vinyl viola violate violation violence violent violet violin
viper virgin virile virtual virtue virtuoso virulent virus visa visage
viscous vise visible vision visit visitor visor vista visual vital
vitality vitamin vitriolic vivacious vivid vixen vocabulary vocal
vocation vociferous vogue voice void volatile volcano volition volley
volt voltage voluble volume voluminous voluntary volunteer voluptuous
vomit voracious vortex vote voter vouch voucher vow vowel voyage
vulgar vulnerable vulture wad waddle wade wafer waffle waft wag wage
wager wagon waif wail waist wait waiter waive wake walk wall wallet
wallow walnut walrus waltz wan wand wander wane want wanton war warble
ward warden wardrobe ware warehouse warfare warm warmth warn warning
warp warrant warranty warrior wart wary wash wasp waste watch water
waterfall waterproof watt wave waver wax way waylay wayward weak
weaken wealth wealthy wean weapon wear weary weasel weather weave web
website wed wedding wedge wednesday weed week weekend weekly weep
weevil weigh weight weird welcome weld welfare well welt welter west
western wet whack whale wharf what whatever wheat wheedle wheel wheeze
when whence whenever where whereas wherever wherewithal whet whether
which whiff while whim whimper whimsical whine whinny whip whir whirl
whirlpool whirlwind whisk whisker whiskey whisper whistle white whiten
whittle whiz who whoever whole wholesale wholesome wholly whom whoop
whose why wick wicked wicker wicket wide widespread widget widow width
wield wife wiggle wigwam wild wildcat wilderness wile will willing
wilt wily win wince winch wind windmill window windshield wine wing
wink winner winnow winsome winter wintry wipe wire wiry wisdom wise
wish wistful wit witch with withal withdraw withdrawal wither withhold
within without withstand witness wizard wizened wobble woe wolf woman
wonder wonderful wont woo wood wooden wool word wordy work worker
workforce workman workshop world worldwide worm worry worse worship
worst worth worthwhile worthy would wound wrangle wrap wrath wreak
wreath wreck wren wrench wrest wrestle wretch wriggle wring wrinkle
wrist writ write writer writhe writing wrong wrought wry xylophone
yacht yank yap yard yarn yawn year yearling yearly yearn yeast yell
yellow yelp yen yeoman yes yesterday yet yield yodel yoke yokel yolk
yonder yore young youngster your yourself youth youthful yule zany
zeal zealot zealous zebra zenith zephyr zeppelin zero zest zigzag zinc
zip zipper zither zodiac zombie zone zoo zoology zoom
abatement about above acceptance accomplishment achievement addiction
additionally administrator adoption advantageous advertisement
advocacy afghanistan agreement airplane aka algeria allegation
alteration amazon america american anorexia antarctica anthrax anti
apartheid application arab arabia argentina argentine asbestos asia
assistance atlantic atmospheric automaker availability avoidance
bacterial balkan baltimore basque been begun beijing berlin bilateral
biochemical biographical biological biomedical biotechnology bombing
borne boston brazil britain british brotherhood brought buildup
bulimia burma california californian cambodia came camel canada
canadian cannot capitalization carcinogen carcinogenic catastrophic
caught chemotherapy chicago chinese christian cleanup combatant
communist comparative competitor computerized con congressional
congressionally consideration contributor corp could coverage
cryptography cuba cuban czech czechoslovakia dangerous datum
deforestation demographic demonstration dentistry deportation
deregulation derivative determinant determination developer did
dietary differential disability disarmament dissatisfaction
distillation disturbance diversification doctorate documentation does
domestically domesticated done driven eaten ecological economically
ecuador egypt electrically email enclosure encryption england eruption
estonia estrogen etc ethanol ethiopia euro europe european evasion
exemption exploitation exploration fallout fatality faulty favorable
fax fertilizer fishery flew forestry france fundamentalism
fundamentalist generalization generalized genetically genome
geographical german germany given gone grammatical greek had harmful
has hazardous heard held hepatitis her herself him himself his
holistic horsepower hydroelectric imbalance impairment implementation
impurity inc incidence inclusion incompetence incompetent india indian
indonesia industrialized inefficiency inflammation inflammatory info
installation intermediary interruption investigator involuntarily iran
iranian iraqi ireland islamic israel israeli issuance its itself japan
japanese jewish jordan jordanian justification kenya killing known
korea korean kremlin kurd kurdistan kurds kuwait laos latest lebanese
lebanon led legalization libya likelihood linkage longest ltd
macroeconomic made malaysia manatee manpower marijuana meant
measurement medication melanoma metabolic meteorological methanol
mexican mexico minnesota modification molecular monoxide multilateral
muslim naturalization negotiator nevada nicaragua nicaraguan nigeria
non noncombatant norway objection oceanographic oceanography olympic
olympics osteoporosis overcrowded overcrowding overfishing overuse
paid pakistan panama payroll pharmaceutical pheromone poisonous
potassium pre predictor preferably pregnancy preservative presidential
prevalence privatization pro proceeding prosecution prostate proven
psychological qatar qualification quantification quantitative rabies
radioactive radiological recommendation regulatory relevance relevancy
renewable repeatedly reportedly reproduction residential restoration
robotics russia russian sahara said saudi scam scientifically scotland
seaweed secrecy serbian shooting shortcoming shown signatory
simulation slovak slovakia societal somalia sought soviet spain
spanish specifically spent sperm spoilage standardized steroid stolen
sub sudan suddenly sunk superconductivity surgical syria taken
takeover tanker taxation tech teenage tehran telecommunication
telemarketer telemarketing texas thailand them themselves thereof
tibet titanium toronto trafficking tsunami turkish turnout ultraviolet
underlying undertaken underway undesirable undocumented unexpected
unfair unknown unmarried unrelated unsubstantiated unsuccessful untrue
unusable unwanted uranium usually vaccination venezuela venezuelan
verification via vietnam viral warsaw washington welsh were wildlife
workplace wrongful wrongfully you

abortionist abroad adjustment adoptee advertizing aforementioned
african africanized agitator agoraphobia airbus anabolic
angiography antiapartheid apache aspirant attendant attributable
awardee ayatollah biomass blackhawk boeing bomber brent broadcaster
brunei buyout calgene capita carpel catabolic cementation
chlorofluorocarbon chunnel cogeneration colonize columbian
conciliator connector contra contractor controller correspondent
counterespionage countervailing crashworthiness crashworthy creditor
crosser crossover cutoff cyberattack defendant deleterious depletion
deplorable devolution diaspora disapproving discernible disclosure
disinvestment divestiture dna dod doing donation downstream dupont
earning eighties emirate enhancer evader exoskeleton exportation
exxon falkland featherbedding fertilization finding flywheel french
fundraising gabon generality geothermal glycolysis going greenhouse
greenpeace
handler holding hydride hydro hydroponic hypocritical immolation
implantation incursion ineffective intensify interconnection
ionospheric iraq jousting kickback layoff legionnaire levitate
levitation lockerbie lockout lyme machination maglev malfeasance
methicillin microorganism middleman minimill misappropriate
motherhood multiport nato nino nobel nonmilitary oncoming opec
oscar oversold parameter paris patentable perpetrator petrochemical
peso phenomenon piecemeal piecework pisa plotter policeman polio
poliomyelitis polyandry polygyny postmenopausal potency
precautionary preferable pressurization pretoria preventative
proactively probability prohibition propound protestation protester
proton psychoactive quantify racism ranking rating readership
recalculation redefinition regulator repay resistant resonance
retiree ricin roadway rotterdam ruling saharan sans sarin scanner
schengen seabed seismology selfless sinking smokestack smuggler
soman sony spaceborne spokespeople staph statistically stirling
stoic stoicism stoppage streetcar subsidize substantive substrate
subtraction supercritical supernova supporter sweatshop swiss
taiwan televangelist thalweg tiananmen tied tipster titan
tryptophan undercover underdeveloped undersea unexplained unrest
unsolicited usable used using valdez vitrification vitro volcanic
volkswagen walkout wreckage york
"""
