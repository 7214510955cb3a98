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
are included deliberately.
"""

LEXICON_WORDS = """
abandon ability able abnormal aboard abolish abortion abound absence
absent absolute absorb abstract absurd abundance abundant abuse
academic academy accelerate accent accept access accident acclaim
accommodate accompany accomplish accord account accumulate accuracy
accurate accuse accustom ace ache achieve acid acknowledge acquire
acre across act action active activist activity actor actress actual
acute adapt add addict addition address adequate adhere adjacent
adjective adjust administer administration admiral admire admission
admit adolescent adopt adore adult advance advantage adventure adverb
adverse advertise advice advise adviser advocate aesthetic affair
affect affection afford afraid africa after afternoon again against
age agency agenda agent aggression aggressive agile agitate ago agony
agree agriculture ahead aid aide aim air aircraft airline airport
aisle alarm album alcohol alert algebra algorithm alien align alike
alive all allege allegiance allergy alley alliance allocate allow
allowance alloy ally almond almost alone along aloud alphabet already
also alter alternate alternative although altitude altogether aluminum
always amateur amaze ambassador amber ambiguous ambition ambitious
ambulance amend amendment amid ammunition among amount ample amuse
analog analogy analysis analyst analyze anatomy ancestor anchor
ancient and anecdote angel anger angle angry animal ankle anniversary
announce annoy annual anonymous another answer ant antenna anthem
anticipate antique anxiety anxious any anybody anymore anyone anything
anyway anywhere apart apartment apology apparatus apparent appeal
appear appearance appetite applaud apple appliance apply appoint
appointment appraise appreciate approach appropriate approval approve
approximate apricot april apron apt arbitrary arc arch architect
architecture archive arctic area arena argue argument arise arithmetic
arm armor army aroma around arrange array arrest arrival arrive
arrogant arrow art artery article articulate artifact artificial
artist artistic ascend ash ashamed aside ask asleep aspect asphalt
aspire assault assemble assembly assert assess asset assign
assignment assist assistant associate association assume assumption
assurance assure asthma astonish astronaut astronomy athlete athletic
atlas atmosphere atom atomic attach attack attain attempt attend
attendance attention attic attitude attorney attract attraction
attractive attribute auction audience audio audit audition august
aunt aura author authority authorize auto automatic automobile autumn
available avenue average aviation avoid await awake award aware away
awesome awful awkward axis baby bachelor back background backward
bacon bacteria bad badge bag baggage bake balance balcony bald ball
balloon ballot bamboo ban banana band bandage bang bank banner
banquet bar barbecue bare bargain bark barn barrel barrier base
baseball basement basic basin basis basket basketball bat batch bath
bathe bathroom battery battle bay beach bead beam bean bear beard
beast beat beautiful beauty because become bed bedroom bee beef beer
before beg begin behalf behave behavior behind being belief believe
bell belly belong below belt bench bend beneath benefit bent berry
beside besides best bet betray better between beverage beware beyond
bias bicycle bid big bike bill billion bin bind biography biology
bird birth birthday biscuit bishop bit bite bitter black blade blame
bland blank blanket blast blaze bleak bleed blend bless blind blink
block blood bloom blossom blow blue blueprint blunt blur board boast
boat body boil bold bolt bomb bond bone bonus book boom boost boot
booth border bore boring born borrow boss botany both bother bottle
bottom bounce bound boundary bouquet bow bowl box boy boycott brace
bracket brain brake branch brand brass brave bread break breakfast
breast breath breathe breed breeze brew brick bride bridge brief
bright brilliant bring brisk broad broadcast brochure broke broken
bronze brook broom brother brow brown browse bruise brush brutal
bubble bucket buckle bud budget buffalo buffer bug build building
bulb bulk bull bullet bulletin bump bunch bundle burden bureau
bureaucracy burn burst bury bus bush business busy but butter
butterfly button buy buzz cabbage cabin cabinet cable cactus cafe
cage cake calcium calculate calendar calf call calm calorie camera
camp campaign campus can canal cancel cancer candidate candle candy
cane cannon canoe canvas canyon cap capable capacity cape capital
captain caption capture car carbon card cardboard care career careful
cargo carnival carpenter carpet carriage carrot carry cart cartoon
carve case cash casino cast castle casual cat catalog catastrophe
catch category cater cathedral cattle cause caution cautious cave
cease ceiling celebrate celebrity cell cellar cement cemetery census
cent center central century ceramic cereal ceremony certain
certificate chain chair chairman chalk challenge chamber champagne
champion championship chance chancellor change channel chaos chapel
chapter character characteristic characterize charcoal charge charity
charm chart charter chase chat cheap cheat check cheek cheer cheese
chef chemical chemistry cherish cherry chess chest chew chicken chief
child childhood chill chimney chin chip chocolate choice choir choke
choose chop chorus chronic chunk church cigarette cinema circle
circuit circulate circumstance cite citizen city civic civil
civilian civilization claim clamp clan clap clarify clarity clash
clasp class classic classify classroom clause claw clay clean clear
clerk clever click client cliff climate climax climb clinic clip
cloak clock close closet cloth clothe cloud club clue cluster clutch
coach coal coalition coarse coast coat code coffee coherent coil coin
coincide cold collaborate collapse collar colleague collect
collection collective college collide colonel colonial colony color
column comb combat combination combine come comedy comfort
comfortable comic command commander commence commend comment commerce
commercial commission commit commitment committee commodity common
communicate communication community commute compact companion company
compare comparison compartment compass compassion compatible compel
compensate compete competence competent competition competitive
compile complain complaint complement complete complex complicate
complication compliment comply component compose composition compound
comprehend comprehensive compress comprise compromise compute
computer conceal concede conceive concentrate concept conception
concern concert concession conclude conclusion concrete condemn
condense condition conduct conductor cone conference confess
confidence confident confidential configure confine confirm conflict
conform confront confuse confusion congratulate congress connect
connection conquer conscience conscious consensus consent consequence
conservative conserve consider considerable consist consistent
console consolidate constant constitute constitution constraint
construct construction consult consultant consume consumer
consumption contact contain container contaminate contemplate
contemporary contempt contend content contest context continent
continue continuous contract contradiction contrary contrast
contribute contribution control controversial controversy convene
convenience convenient convention conventional converge conversation
converse convert convey convict conviction convince cook cookie cool
cooperate cooperative coordinate cop cope copper copy copyright coral
cord core cork corn corner corporate corporation corps correct
correlate correspond corridor corrupt corruption cosmetic cost
costume cottage cotton couch cough council counsel count counter
country county couple coupon courage course court courtesy cousin
cover cow coward crab crack cradle craft crane crash crawl crazy
cream create creation creative creature credit creed creek creep crew
cricket crime criminal crisis crisp criteria criterion critic
critical criticism criticize critique crop cross crowd crown crucial
crude cruel cruise crumble crush cry crystal cube cucumber cue
culprit cult cultivate cultural culture cunning cup cupboard curb
cure curiosity curious curl currency current curriculum curse curtain
curve cushion custom customer cut cute cycle cylinder daily dairy dam
damage damp dance danger dare dark darling dash data database date
daughter dawn day dazzle dead deadline deaf deal dealer dear death
debate debris debt debut decade decay december decent decide decimal
decision deck declare decline decorate decrease decree dedicate deduce
deed deem deep deer default defeat defect defend defense defer define
definite definition defy degree delay delegate delete deliberate
delicate delicious delight deliver delivery demand democracy
democratic demolish demonstrate denial denote denounce dense density
dental deny depart department departure depend dependent depict
deploy deposit depot depress depression deprive depth deputy derive
descend descent describe description desert deserve design designate
desirable desire desk despair desperate despise despite dessert
destination destiny destroy destruction detail detain detect
detective deter deteriorate determine devastate develop development
deviate device devil devise devote diagnose diagnosis diagram dial
dialect dialogue diameter diamond diary dictate dictionary die diet
differ difference different difficult difficulty dig digest digital
dignity dilemma dim dimension diminish dine dinner dinosaur dioxide
dip diploma diplomat direct direction director dirt dirty disable
disagree disappear disappoint disaster disc discard discharge
discipline disclose discount discourage discourse discover discovery
discreet discrete discriminate discuss discussion disease disguise
disgust dish dislike dismiss disorder dispatch dispense disperse
displace display dispose dispute disrupt dissent dissolve distance
distant distinct distinguish distort distract distress distribute
distribution district disturb ditch dive diverse diversity divert
divide dividend divine division divorce dizzy dock doctor doctrine
document dog doll dollar dolphin domain dome domestic dominant
dominate donate donkey donor doom door dose dot double doubt dough
dove down download downtown dozen draft drag dragon drain drama
dramatic drastic draw drawer drawing dread dream dress drift drill
drink drip drive driver drop drought drown drug drum dry dual duck
due duke dull dumb dump durable duration during dusk dust duty dwarf
dwell dye dynamic dynasty each eager eagle ear early earn earnest
earth earthquake ease east easter eastern easy eat echo eclipse
ecology economic economy edge edit edition editor educate education
eel effect effective efficiency efficient effort egg ego eight
either elaborate elastic elbow elder elect election electric
electricity electronic elegant element elementary elephant elevate
elevator eligible eliminate elite else elsewhere embark embarrass
embassy embed emblem embrace emerge emergency emission emit emotion
emotional emperor emphasis emphasize empire employ employee employer
employment empty enable enact enclose encounter encourage encyclopedia
end endeavor endless endorse endure enemy energy enforce engage
engine engineer english enhance enjoy enlarge enlist enormous enough
enrich enroll ensure entail enter enterprise entertain enthusiasm
enthusiastic entire entitle entity entrance entrepreneur entry
envelope environment environmental envision envy epidemic episode
equal equation equip equipment equity equivalent era erase erect
erode erosion error erupt escalate escape escort especially essay
essence essential establish establishment estate esteem estimate
eternal ethic ethical ethnic evacuate evaluate evaporate eve even
evening event eventual ever every everybody everyday everyone
everything everywhere evidence evident evil evoke evolve exact
exaggerate exam examination examine example exceed excel excellence
excellent except exception excerpt excess exchange excite exclaim
exclude exclusive excuse execute executive exempt exercise exert
exhaust exhibit exhibition exile exist existence exit exotic expand
expansion expect expectation expedition expel expense expensive
experience experiment expert expire explain explanation explicit
explode exploit explore explosion explosive export expose exposure
express expression extend extension extensive extent exterior
external extinct extra extract extraordinary extreme eye fabric
fabulous face facilitate facility fact faction factor factory faculty
fade fail failure faint fair fairy faith fall false fame familiar
family famine famous fan fancy fantastic fantasy far fare farm farmer
fascinate fashion fast fasten fat fatal fate father fatigue fault
favor favorite fear feasible feast feather feature february federal
fee feed feedback feel fellow female fence ferry fertile festival
fetch fever few fiber fiction field fierce fifteen fifth fifty fig
fight figure file fill film filter fin final finance financial find
fine finger finish finite fire firm first fiscal fish fisherman fist
fit fitness five fix flag flame flash flat flavor flaw flee fleet
flesh flexible flight flip float flock flood floor flour flourish
flow flower fluctuate fluent fluid flush fly foam focus fog foil fold
folk follow fond food fool foot football for forbid force forecast
forehead foreign foreigner forest forever forge forget forgive fork
form formal format formation former formula forth fortnight fortress
fortunate fortune forty forum forward fossil foster found foundation
fountain four fourteen fourth fox fraction fragile fragment fragrance
frame franchise frank fraud free freedom freeze freight frequency
frequent fresh friction friday fridge friend friendly friendship
fright frighten frog from front frontier frost frown fruit frustrate
fry fuel fulfill full fun function fund fundamental funeral fungus
funny fur furious furnace furnish furniture further fury fuse fusion
future gadget gain galaxy gallery gallon gamble game gang gap garage
garbage garden garlic garment gas gasoline gate gather gauge gaze
gear gem gender gene general generate generation generator generous
genetic genius genre gentle gentleman genuine geography geology
geometry germ gesture get ghost giant gift gig giggle ginger girl
give glacier glad glance gland glass glimpse globe gloom glorious
glory glove glow glue goal goat god gold golden golf good goodbye
goodness goods goose gossip govern government governor gown grab
grace grade gradual graduate grain grand grandfather grandmother
grant grape graph graphic grasp grass grateful gratitude grave
gravity gray graze grease great greed green greet grid grief grieve
grill grim grin grind grip grocery gross ground group grove grow
growth guarantee guard guardian guess guest guidance guide guild
guilt guilty guitar gulf gum gun gut guy gym habit habitat hail hair
half hall halt ham hammer hand handful handle handsome hang happen
happiness happy harbor hard hardly hardship hardware harm harmony
harsh harvest hat hatch hate haul haunt have hawk hay hazard haze
head headline headquarters heal health healthy heap hear hearing
heart heat heaven heavy hedge heel height heir helicopter hell hello
helmet help helpful hemisphere hen hence herb herd here heritage hero
heroic hesitate hidden hide high highlight highway hike hill hint hip
hire historian historic historical history hit hobby hockey hold hole
holiday hollow holy home homework honest honey honor hook hope
horizon horizontal horn horror horse hospital host hostage hostile
hot hotel hour house household housing hover how however hug huge
hull human humanity humble humid humor hundred hunger hungry hunt
hunter hurdle hurricane hurry hurt husband hut hybrid hydrogen
hygiene hymn hypothesis ice icon idea ideal identical identification
identify identity ideology idiom idiot idle idol ignite ignorance
ignorant ignore ill illegal illness illusion illustrate image
imagination imagine imitate immediate immense immigrant immigration
imminent immune impact impair imperial implement implication implicit
imply import importance important impose impossible impress
impression impressive imprison improve improvement impulse inch
incentive incident incline include income incorporate increase
incredible incur indeed independence independent index indicate
indication indicator indifferent indigenous individual indoor induce
indulge industrial industry inevitable infant infect infection infer
inferior infinite inflation inflict influence influential inform
informal information infrastructure ingredient inhabit inhabitant
inhale inherent inherit inhibit initial initiate initiative inject
injure injury ink inland inmate inn inner innocence innocent
innovation input inquire inquiry insect insert inside insight insist
inspect inspector inspire install instance instant instead instinct
institute institution instruct instruction instrument insufficient
insult insurance insure intact intake integral integrate integrity
intellectual intelligence intelligent intend intense intensity
intensive intent intention interact interaction interest interesting
interface interfere interior intermediate internal international
internet interpret interpretation interrupt intersection interval
intervene intervention interview intimate intricate intrigue
introduce introduction intrude invade invasion invent invention
invest investigate investigation investment investor invisible
invitation invite invoke involve involvement iron ironic irony
irrigation irritate island isolate isolation issue item ivory jacket
jail jam january jar jaw jazz jealous jeans jelly jet jewel jewelry
job jog join joint joke journal journalism journalist journey joy
judge judgment judicial juice july jump junction june jungle junior
junk jurisdiction jury just justice justify juvenile keen keep
kettle key keyboard kick kid kidnap kidney kill kilometer kind
kindergarten king kingdom kiss kit kitchen kite knee kneel knife
knight knit knob knock knot know knowledge label labor laboratory
lace lack ladder lady lake lamb lamp land landlord landmark
landscape lane language lantern lap lapse large laser last late
lately latent later latter laugh laughter launch laundry lava lavish
law lawn lawsuit lawyer lay layer layout lazy lead leader leadership
leaf league leak lean leap learn lease leather leave lecture left
leg legacy legal legend legislation legislature legitimate leisure
lemon lend length lens leopard less lesson let letter lettuce level
lever liability liable liberal liberate liberty library license lick
lid lie life lifestyle lifetime lift light lightning like likely
likewise limb lime limit limitation limp line linear linen linger
linguistic link lion lip liquid liquor list listen literacy literal
literary literature litter little live lively liver livestock living
lizard load loaf loan lobby local locate location lock locomotive
lodge loft log logic logical logo lone lonely long look loop loose
lord lose loss lost lot lottery loud lounge love lovely lover low
lower loyal loyalty luck lucky luggage lumber lump lunar lunch lung
lure lush luxury machine machinery mad magazine magic magnet
magnetic magnificent magnitude maid mail main mainland mainstream
maintain maintenance majesty major majority make maker male mall
mammal man manage management manager mandate mandatory maneuver
manifest manipulate mankind manner mansion manual manufacture
manufacturer manuscript many map maple marathon marble march margin
marine mark market marketing marriage marry marsh martial marvel
mask mass massacre massage massive mast master mat match mate
material maternal math mathematics matrix matter mature maximum may
maybe mayor meadow meal mean meaning meantime meanwhile measure meat
mechanic mechanical mechanism medal media mediate medical medicine
medieval meditate medium meet meeting melody melon melt member
membership membrane memo memorial memory menace mend mental mention
mentor menu merchant mercy mere merge merit mess message messenger
metal metaphor meter method metric metropolitan microphone microscope
middle midnight midst might migrant migrate migration mild mile
militant military milk mill million mimic mind mine mineral mingle
minimal minimize minimum minister ministry minor minority mint minute
miracle mirror mischief miserable misery misfortune mislead miss
missile mission missionary mist mistake mistress mix mixture moan mob
mobile mock mode model moderate modern modest modify module moist
moisture mold molecule moment momentum monarch monastery monday
money monitor monk monkey monopoly monster month monument mood moon
moral morale more moreover morning mortal mortgage mosaic mosque
mosquito moss most motel mother motion motivate motive motor
motorcycle motto mount mountain mourn mouse mouth move movement
movie much mud mule multiple multiply municipal murder murmur muscle
museum mushroom music musical musician must mustard mute mutter
mutual myriad mystery myth nail naive name namely nap napkin narrate
narrative narrow nasty nation national native natural nature naval
navigate navy near nearby nearly neat necessary necessity neck
necklace need needle negative neglect negotiate negotiation neighbor
neighborhood neither nephew nerve nervous nest net network neutral
never nevertheless new news newspaper next nice niche nickel
nickname niece night nightmare nine nineteen ninety noble nobody nod
noise nominal nominate nomination none nonetheless nonsense noodle
noon nor norm normal north northeast northern northwest nose notable
note nothing notice notify notion notorious noun novel november now
nowhere nuclear nucleus nuisance number numerous nun nurse nursery
nut nutrition oak oar oath obedient obey object objective obligation
oblige obscure observation observe observer obsess obstacle obtain
obvious occasion occasional occupation occupy occur occurrence ocean
october odd odor off offend offense offensive offer office officer
official offset offspring often oil okay old olive omit once one
ongoing onion online only onset onto opaque open opera operate
operation operator opinion opponent opportunity oppose opposite
opposition oppress opt optical optimism optimistic option optional
oral orange orbit orchard orchestra ordeal order ordinary ore organ
organic organism organization organize orient orientation origin
original originate ornament orphan orthodox other otherwise ought
ounce out outbreak outcome outdoor outer outfit outlet outline
outlook output outrage outside outstanding oval oven over overall
overcome overhead overlap overlook overnight overseas oversee
overturn overwhelm owe owl own owner ownership oxygen oyster ozone
pace pack package packet pact pad paddle page pain painful paint
painter painting pair palace pale palm pamphlet pan pancake panel
panic panorama pant paper parade paradise paradox paragraph parallel
paralyze parcel pardon parent parish park parliament part partial
participant participate participation particle particular partly
partner partnership party pass passage passenger passion passive
passport past pasta paste pastor pasture pat patch patent path
pathetic patience patient patriot patrol patron pattern pause pave
pavement paw pay payment pea peace peaceful peach peak peanut pear
pearl peasant peculiar pedal peel peer pen penalty pencil pending
penetrate penny pension people pepper per perceive percent
percentage perception perch perfect perform performance perfume
perhaps peril period permanent permission permit perpetual persist
person personal personality personnel perspective persuade pest pet
petition petrol petroleum phase phenomenon philosopher philosophy
phone photo photograph photographer phrase physical physician
physics piano pick picture pie piece pierce pig pigeon pile pilgrim
pill pillar pillow pilot pin pinch pine pink pioneer pipe pipeline
pirate pistol pit pitch pity pivot pixel pizza place plague plain
plan plane planet plank plant plantation plasma plaster plastic
plate plateau platform play player plea plead pleasant please
pleasure pledge plenty plight plot plow plug plumber plunge plural
plus pocket poem poet poetry point poison polar pole police policy
polish polite political politician politics poll pollute pollution
pond ponder pool poor pop popular population porch pork port
portable porter portfolio portion portrait portray pose position
positive possess possession possibility possible post postage
postpone posture pot potato potential pottery poultry pound pour
poverty powder power powerful practical practice praise pray prayer
preach precaution precede precedent precious precise predator
predecessor predict prediction prefer preference pregnant prejudice
preliminary premier premise premium preparation prepare prescribe
prescription presence present preservation preserve preside
presidency president press pressure prestige presume pretend pretty
prevail prevent previous prey price pride priest primary prime
primitive prince princess principal principle print prior priority
prison prisoner privacy private privilege prize probable probably
probe problem procedure proceed process procession proclaim produce
producer product production productive profession professional
professor profile profit profound program progress progressive
prohibit project prominent promise promote promotion prompt prone
pronounce proof prop propaganda propel proper property prophet
proportion proposal propose proposition prose prosecute prospect
prosper prosperity protect protection protein protest protocol
prototype proud prove proverb provide province provision provoke
proxy prudent public publication publicity publish publisher pudding
pull pulse pump punch punish punishment pupil purchase pure purple
purpose purse pursue pursuit push put puzzle pyramid quaint qualify
quality quantity quarrel quarter queen quest question queue quick
quiet quit quite quota quote rabbit race rack radar radiation
radical radio radius raft rage raid rail railroad railway rain rainbow
raise rally ranch random range rank ransom rapid rare rash rat rate
rather ratio ration rational rattle raw ray reach react reaction
read reader ready real realistic reality realize realm reap rear
reason reasonable rebel rebellion recall receipt receive receiver
recent reception recession recipe recipient recite reckless reckon
recognition recognize recommend reconcile record recount recover
recovery recruit rectangle recur recycle red reduce reduction
redundant reed reef refer referee reference referendum refine
reflect reflection reform refrain refresh refuge refugee refusal
refuse regain regard regardless regime region regional register
regret regular regulate regulation rehabilitate rehearse reign
reinforce reject relate relation relationship relative relax relay
release relevant reliable relief relieve religion religious reluctant
rely remain remark remarkable remedy remember remind remnant remote
removal remove render renew rent repair repeat repetition replace
reply report reporter represent representation representative
repress reproduce reptile republic reputation request require
requirement rescue research researcher resemble resent reservation
reserve reservoir reside residence resident residue resign
resignation resist resistance resolution resolve resort resource
respect respective respond response responsibility responsible rest
restaurant restore restrain restraint restrict restriction result
resume retail retain retire retirement retreat retrieve return
reveal revenge revenue reverse review revise revival revive revolt
revolution revolutionary reward rhetoric rhythm ribbon rice rich rid
riddle ride rider ridge ridiculous rifle right rigid rigorous rim
ring riot rip ripe rise risk ritual rival river road roam roar roast
rob robot robust rock rocket rod role roll romance romantic roof
room root rope rose roster rotate rough round route routine row
royal royalty rub rubber rubbish rude rug ruin rule ruler rumor run
runner running rural rush rust sack sacred sacrifice sad saddle
safe safeguard safety sail sailor saint sake salad salary sale
salmon salon salt salute salvation same sample sanction sanctuary
sand sandwich sane satellite satisfaction satisfy sauce saucer
sausage savage save saving say scale scan scandal scar scarce scare
scarf scatter scenario scene scenery scent schedule scheme scholar
scholarship school science scientific scientist scissors scope score
scorn scout scramble scrap scrape scratch scream screen screw script
scrutiny sculpture sea seal seam search season seat second secret
secretary section sector secular secure security see seed seek seem
segment seize seldom select selection self sell semester seminar
senate senator send senior sensation sense sensible sensitive
sentence sentiment separate september sequence serene sergeant serial
series serious sermon servant serve service session set setting
settle settlement seven seventeen seventy several severe sew shabby
shade shadow shaft shake shall shallow shame shape share shareholder
shark sharp shatter shave she shed sheep sheer sheet shelf shell
shelter shepherd shield shift shine ship shirt shiver shock shoe
shoot shop shore short shortage shot should shoulder shout shove
shovel show shower shrewd shriek shrink shrub shrug shut shuttle shy
sibling sick side siege sigh sight sign signal signature significance
significant signify silence silent silk silly silver similar simple
simplify simply simulate simultaneous sin since sincere sing singer
single singular sink sir siren sister sit site situation six sixteen
sixty size skeleton skeptical sketch ski skill skin skip skirt skull
sky slab slam slap slash slate slaughter slave sleep sleeve slender
slice slide slight slim slip slogan slope slot slow slump small
smart smash smell smile smoke smooth snake snap snatch sneak snow
soak soap soar sob sober soccer social society sociology sock soda
sofa soft software soil solar soldier sole solemn solid solidarity
solitary solo solution solve somber some somebody somehow someone
something sometime sometimes somewhat somewhere son song soon sophisticated
sore sorrow sorry sort soul sound soup sour source south southeast
southern southwest sovereign sovereignty space spacious span spare
spark sparkle speak speaker spear special specialist species
specific specify specimen spectacle spectacular spectator spectrum
speculate speech speed spell spend sphere spice spider spill spin
spine spiral spirit spiritual spit spite splash splendid split spoil
spokesman sponsor spontaneous spoon sport spot spouse spray spread
spring sprinkle spur spy squad square squeeze squirrel stab
stability stable stack stadium staff stage stagger stain stair
stake stale stall stamp stance stand standard standing staple star
stare stark start startle starve state statement statesman static
station stationary statistic statue status statute stay steady steak
steal steam steel steep steer stem step stereotype stern stew stick
sticky stiff stifle stigma still stimulate stimulus sting stir
stitch stock stomach stone stool stoop stop storage store storm
story stout stove straight strain strand strange stranger strap
strategic strategy straw strawberry stray streak stream street
strength strengthen stress stretch strict stride strike string strip
stripe strive stroke stroll strong structural structure struggle
stubborn student studio study stuff stumble stun stunt stupid sturdy
style subject subjective submarine submit subordinate subscribe
subsidiary subsidy substance substantial substitute subtle subtract
suburb subway succeed success successful succession successive
successor such suck sudden sue suffer sufficient sugar suggest
suggestion suicide suit suitable suitcase suite sum summary summer
summit summon sun sunday sunny sunrise sunset sunshine super superb
superficial superior supermarket supervise supervisor supper
supplement supply support suppose suppress supreme sure surface
surge surgeon surgery surname surpass surplus surprise surrender
surround surveillance survey survival survive survivor suspect
suspend suspension suspicion suspicious sustain swallow swamp swan
swap swarm sway swear sweat sweater sweep sweet swell swift swim
swing switch sword syllable symbol symbolic symmetry sympathetic
sympathy symphony symptom syndrome synthesis synthetic syrup system
systematic table tablet tackle tact tactic tag tail tailor take
tale talent talk tall tame tan tangible tangle tank tap tape target
tariff task taste tattoo tax taxi tea teach teacher team tear
tease technical technician technique technology tedious teen
teenager telephone telescope television tell temper temperature
temple tempo temporary tempt ten tenant tend tendency tender tennis
tense tension tent tentative tenure term terminal terminate terrace
terrain terrible terrific territory terror terrorism terrorist test
testament testify testimony text textbook textile texture than thank
that theater theft theme then theology theoretical theory therapy
there thereby therefore thermal thesis they thick thief thigh thin
thing think third thirst thirteen thirty this thorn thorough those
though thought thousand thread threat threaten three threshold
thrill thrive throat throne through throughout throw thrust thumb
thunder thursday thus ticket tide tidy tie tiger tight tile till
tilt timber time timely timid tin tiny tip tire tissue title toast
tobacco today toe together toil token tolerance tolerant tolerate
toll tomato tomb tomorrow ton tone tongue tonight too tool tooth top
topic topple torch torment torture toss total touch tough tour
tourism tourist tournament tow toward towel tower town toxic toy
trace track tract tractor trade tradition traditional traffic
tragedy tragic trail train trainer training trait traitor tranquil
transaction transcend transcript transfer transform transformation
transit transition translate translation transmission transmit
transparent transplant transport transportation trap trash trauma
travel tray treason treasure treasury treat treatment treaty tree
trek tremble tremendous trench trend trial triangle tribe tribunal
tribute trick trickle trifle trigger trim trio trip triple triumph
trivial troop trophy tropical trouble truce truck true trumpet
trunk trust truth try tube tuck tuesday tug tuition tumble tumor
tune tunnel turbine turf turkey turmoil turn turtle tutor twelve
twenty twice twig twilight twin twist two type typical tyranny
tyrant ugly ultimate umbrella unanimous uncle under undergo
undergraduate underground underline undermine underneath understand
understanding undertake unemployment unfold uniform unify union
unique unit unite unity universal universe university unless
unlike until unusual upcoming update upgrade uphold upon upper
upright uprising upset upstairs urban urge urgent usage use useful
user usual utility utilize utmost utter vacant vacation vaccine
vacuum vague vain valid validity valley valuable value valve van
vanish vanity vapor variable variation varied variety various vary
vase vast vault vegetable vehicle veil vein velocity velvet vendor
venture venue verbal verdict verge verify versatile verse version
versus vertical very vessel veteran veto viable vibrant vibrate
vice vicinity vicious victim victory video view viewer viewpoint
vigil vigorous village villain vine vinegar vintage violate
violation violence violent violet violin virtual virtue virus visa
visible vision visit visitor visual vital vivid vocabulary vocal
vocation voice void volatile volcano volume voluntary volunteer
vote voter vow voyage vulnerable wage wagon waist wait waiter wake
walk wall wallet wander want war ward wardrobe warehouse warfare
warm warn warning warrant warrior wary wash wasp waste watch water
waterfall wave wax way weak wealth wealthy weapon wear weary
weather weave web website wedding wedge wednesday weed week weekend
weekly weep weigh weight weird welcome welfare well west western
wet whale wharf what whatever wheat wheel when whenever where
whereas wherever whether which while whim whip whirl whisk whisper
whistle white who whoever whole wholesale wholly whom whose why
wicked wide widespread widow width wield wife wild wilderness will
willing win wind window wine wing wink winner winter wipe wire
wisdom wise wish wit witch with withdraw withdrawal wither withhold
within without withstand witness wizard wolf woman wonder wonderful
wood wooden wool word work worker workforce workshop world worldwide
worm worry worse worship worst worth worthy would wound wrap wrath
wreck wrestle wrinkle wrist write writer writing wrong yacht yard
yarn yawn year yearly yearn yeast yell yellow yes yesterday yet
yield young youngster your youth zeal zebra zero zinc zone zoo
"""
