NAME          FACLOC101
ROWS
 N  OBJ
 E  R0
 E  R1
 E  R2
 E  R3
 E  R4
 E  R5
 E  R6
 E  R7
 E  R8
 E  R9
 E  R10
 E  R11
 E  R12
 E  R13
 E  R14
 E  R15
 E  R16
 E  R17
 E  R18
 E  R19
 E  R20
 E  R21
 E  R22
 E  R23
 E  R24
 L  R25
 L  R26
 L  R27
 L  R28
 L  R29
 L  R30
 L  R31
 L  R32
 L  R33
 L  R34
 L  R35
 L  R36
 L  R37
 L  R38
 L  R39
 L  R40
 L  R41
 L  R42
 L  R43
 L  R44
 L  R45
 L  R46
 L  R47
 L  R48
 L  R49
 L  R50
 L  R51
 L  R52
 L  R53
 L  R54
 L  R55
 L  R56
 L  R57
 L  R58
 L  R59
 L  R60
 L  R61
 L  R62
 L  R63
 L  R64
 L  R65
 L  R66
 L  R67
 L  R68
 L  R69
 L  R70
 L  R71
 L  R72
 L  R73
 L  R74
 L  R75
 L  R76
 L  R77
 L  R78
 L  R79
 L  R80
 L  R81
 L  R82
 L  R83
 L  R84
 L  R85
 L  R86
 L  R87
 L  R88
 L  R89
 L  R90
 L  R91
 L  R92
 L  R93
 L  R94
 L  R95
 L  R96
 L  R97
 L  R98
 L  R99
 L  R100
 L  R101
 L  R102
 L  R103
 L  R104
 L  R105
 L  R106
 L  R107
 L  R108
 L  R109
 L  R110
 L  R111
 L  R112
 L  R113
 L  R114
 L  R115
 L  R116
 L  R117
 L  R118
 L  R119
 L  R120
 L  R121
 L  R122
 L  R123
 L  R124
 L  R125
 L  R126
 L  R127
 L  R128
 L  R129
 L  R130
 L  R131
 L  R132
 L  R133
 L  R134
 L  R135
 L  R136
 L  R137
 L  R138
 L  R139
 L  R140
 L  R141
 L  R142
 L  R143
 L  R144
 L  R145
 L  R146
 L  R147
 L  R148
 L  R149
 L  R150
 L  R151
 L  R152
 L  R153
 L  R154
 L  R155
 L  R156
 L  R157
 L  R158
 L  R159
 L  R160
 L  R161
 L  R162
 L  R163
 L  R164
 L  R165
 L  R166
 L  R167
 L  R168
 L  R169
 L  R170
 L  R171
 L  R172
 L  R173
 L  R174
 L  R175
 L  R176
 L  R177
 L  R178
 L  R179
 L  R180
 L  R181
 L  R182
 L  R183
 L  R184
 L  R185
 L  R186
 L  R187
 L  R188
 L  R189
 L  R190
 L  R191
 L  R192
 L  R193
 L  R194
 L  R195
 L  R196
 L  R197
 L  R198
 L  R199
 L  R200
 L  R201
 L  R202
 L  R203
 L  R204
 L  R205
 L  R206
 L  R207
 L  R208
 L  R209
 L  R210
 L  R211
 L  R212
 L  R213
 L  R214
 L  R215
 L  R216
 L  R217
 L  R218
 L  R219
 L  R220
 L  R221
 L  R222
 L  R223
 L  R224
COLUMNS
    X0  R0  1.0
    X0  R25  1.0
    X0  OBJ  9.0
    X1  R1  1.0
    X1  R26  1.0
    X1  OBJ  28.0
    X2  R2  1.0
    X2  R27  1.0
    X2  OBJ  21.0
    X3  R3  1.0
    X3  R28  1.0
    X3  OBJ  11.0
    X4  R4  1.0
    X4  R29  1.0
    X4  OBJ  4.0
    X5  R5  1.0
    X5  R30  1.0
    X5  OBJ  23.0
    X6  R6  1.0
    X6  R31  1.0
    X6  OBJ  12.0
    X7  R7  1.0
    X7  R32  1.0
    X7  OBJ  18.0
    X8  R8  1.0
    X8  R33  1.0
    X8  OBJ  18.0
    X9  R9  1.0
    X9  R34  1.0
    X9  OBJ  9.0
    X10  R10  1.0
    X10  R35  1.0
    X10  OBJ  11.0
    X11  R11  1.0
    X11  R36  1.0
    X11  OBJ  27.0
    X12  R12  1.0
    X12  R37  1.0
    X12  OBJ  23.0
    X13  R13  1.0
    X13  R38  1.0
    X13  OBJ  26.0
    X14  R14  1.0
    X14  R39  1.0
    X14  OBJ  4.0
    X15  R15  1.0
    X15  R40  1.0
    X15  OBJ  11.0
    X16  R16  1.0
    X16  R41  1.0
    X16  OBJ  3.0
    X17  R17  1.0
    X17  R42  1.0
    X17  OBJ  29.0
    X18  R18  1.0
    X18  R43  1.0
    X18  OBJ  20.0
    X19  R19  1.0
    X19  R44  1.0
    X19  OBJ  7.0
    X20  R20  1.0
    X20  R45  1.0
    X20  OBJ  24.0
    X21  R21  1.0
    X21  R46  1.0
    X21  OBJ  24.0
    X22  R22  1.0
    X22  R47  1.0
    X22  OBJ  10.0
    X23  R23  1.0
    X23  R48  1.0
    X23  OBJ  20.0
    X24  R24  1.0
    X24  R49  1.0
    X24  OBJ  3.0
    X25  R0  1.0
    X25  R50  1.0
    X25  OBJ  14.0
    X26  R1  1.0
    X26  R51  1.0
    X26  OBJ  17.0
    X27  R2  1.0
    X27  R52  1.0
    X27  OBJ  1.0
    X28  R3  1.0
    X28  R53  1.0
    X28  OBJ  23.0
    X29  R4  1.0
    X29  R54  1.0
    X29  OBJ  26.0
    X30  R5  1.0
    X30  R55  1.0
    X30  OBJ  21.0
    X31  R6  1.0
    X31  R56  1.0
    X31  OBJ  17.0
    X32  R7  1.0
    X32  R57  1.0
    X32  OBJ  29.0
    X33  R8  1.0
    X33  R58  1.0
    X33  OBJ  12.0
    X34  R9  1.0
    X34  R59  1.0
    X34  OBJ  13.0
    X35  R10  1.0
    X35  R60  1.0
    X35  OBJ  11.0
    X36  R11  1.0
    X36  R61  1.0
    X36  OBJ  14.0
    X37  R12  1.0
    X37  R62  1.0
    X37  OBJ  19.0
    X38  R13  1.0
    X38  R63  1.0
    X38  OBJ  15.0
    X39  R14  1.0
    X39  R64  1.0
    X39  OBJ  11.0
    X40  R15  1.0
    X40  R65  1.0
    X40  OBJ  18.0
    X41  R16  1.0
    X41  R66  1.0
    X41  OBJ  15.0
    X42  R17  1.0
    X42  R67  1.0
    X42  OBJ  2.0
    X43  R18  1.0
    X43  R68  1.0
    X43  OBJ  11.0
    X44  R19  1.0
    X44  R69  1.0
    X44  OBJ  11.0
    X45  R20  1.0
    X45  R70  1.0
    X45  OBJ  2.0
    X46  R21  1.0
    X46  R71  1.0
    X46  OBJ  1.0
    X47  R22  1.0
    X47  R72  1.0
    X47  OBJ  8.0
    X48  R23  1.0
    X48  R73  1.0
    X48  OBJ  8.0
    X49  R24  1.0
    X49  R74  1.0
    X49  OBJ  25.0
    X50  R0  1.0
    X50  R75  1.0
    X50  OBJ  26.0
    X51  R1  1.0
    X51  R76  1.0
    X51  OBJ  24.0
    X52  R2  1.0
    X52  R77  1.0
    X52  OBJ  14.0
    X53  R3  1.0
    X53  R78  1.0
    X53  OBJ  20.0
    X54  R4  1.0
    X54  R79  1.0
    X54  OBJ  20.0
    X55  R5  1.0
    X55  R80  1.0
    X55  OBJ  14.0
    X56  R6  1.0
    X56  R81  1.0
    X56  OBJ  13.0
    X57  R7  1.0
    X57  R82  1.0
    X57  OBJ  29.0
    X58  R8  1.0
    X58  R83  1.0
    X58  OBJ  14.0
    X59  R9  1.0
    X59  R84  1.0
    X59  OBJ  25.0
    X60  R10  1.0
    X60  R85  1.0
    X60  OBJ  12.0
    X61  R11  1.0
    X61  R86  1.0
    X61  OBJ  8.0
    X62  R12  1.0
    X62  R87  1.0
    X62  OBJ  25.0
    X63  R13  1.0
    X63  R88  1.0
    X63  OBJ  17.0
    X64  R14  1.0
    X64  R89  1.0
    X64  OBJ  17.0
    X65  R15  1.0
    X65  R90  1.0
    X65  OBJ  28.0
    X66  R16  1.0
    X66  R91  1.0
    X66  OBJ  3.0
    X67  R17  1.0
    X67  R92  1.0
    X67  OBJ  23.0
    X68  R18  1.0
    X68  R93  1.0
    X68  OBJ  7.0
    X69  R19  1.0
    X69  R94  1.0
    X69  OBJ  11.0
    X70  R20  1.0
    X70  R95  1.0
    X70  OBJ  25.0
    X71  R21  1.0
    X71  R96  1.0
    X71  OBJ  14.0
    X72  R22  1.0
    X72  R97  1.0
    X72  OBJ  6.0
    X73  R23  1.0
    X73  R98  1.0
    X73  OBJ  16.0
    X74  R24  1.0
    X74  R99  1.0
    X74  OBJ  23.0
    X75  R0  1.0
    X75  R100  1.0
    X75  OBJ  27.0
    X76  R1  1.0
    X76  R101  1.0
    X76  OBJ  3.0
    X77  R2  1.0
    X77  R102  1.0
    X77  OBJ  21.0
    X78  R3  1.0
    X78  R103  1.0
    X78  OBJ  23.0
    X79  R4  1.0
    X79  R104  1.0
    X79  OBJ  12.0
    X80  R5  1.0
    X80  R105  1.0
    X80  OBJ  7.0
    X81  R6  1.0
    X81  R106  1.0
    X81  OBJ  14.0
    X82  R7  1.0
    X82  R107  1.0
    X82  OBJ  6.0
    X83  R8  1.0
    X83  R108  1.0
    X83  OBJ  3.0
    X84  R9  1.0
    X84  R109  1.0
    X84  OBJ  8.0
    X85  R10  1.0
    X85  R110  1.0
    X85  OBJ  15.0
    X86  R11  1.0
    X86  R111  1.0
    X86  OBJ  19.0
    X87  R12  1.0
    X87  R112  1.0
    X87  OBJ  7.0
    X88  R13  1.0
    X88  R113  1.0
    X88  OBJ  9.0
    X89  R14  1.0
    X89  R114  1.0
    X89  OBJ  3.0
    X90  R15  1.0
    X90  R115  1.0
    X90  OBJ  15.0
    X91  R16  1.0
    X91  R116  1.0
    X91  OBJ  3.0
    X92  R17  1.0
    X92  R117  1.0
    X92  OBJ  10.0
    X93  R18  1.0
    X93  R118  1.0
    X93  OBJ  7.0
    X94  R19  1.0
    X94  R119  1.0
    X94  OBJ  1.0
    X95  R20  1.0
    X95  R120  1.0
    X95  OBJ  21.0
    X96  R21  1.0
    X96  R121  1.0
    X96  OBJ  1.0
    X97  R22  1.0
    X97  R122  1.0
    X97  OBJ  6.0
    X98  R23  1.0
    X98  R123  1.0
    X98  OBJ  12.0
    X99  R24  1.0
    X99  R124  1.0
    X99  OBJ  17.0
    X100  R0  1.0
    X100  R125  1.0
    X100  OBJ  29.0
    X101  R1  1.0
    X101  R126  1.0
    X101  OBJ  18.0
    X102  R2  1.0
    X102  R127  1.0
    X102  OBJ  10.0
    X103  R3  1.0
    X103  R128  1.0
    X103  OBJ  29.0
    X104  R4  1.0
    X104  R129  1.0
    X104  OBJ  22.0
    X105  R5  1.0
    X105  R130  1.0
    X105  OBJ  14.0
    X106  R6  1.0
    X106  R131  1.0
    X106  OBJ  12.0
    X107  R7  1.0
    X107  R132  1.0
    X107  OBJ  23.0
    X108  R8  1.0
    X108  R133  1.0
    X108  OBJ  2.0
    X109  R9  1.0
    X109  R134  1.0
    X109  OBJ  2.0
    X110  R10  1.0
    X110  R135  1.0
    X110  OBJ  1.0
    X111  R11  1.0
    X111  R136  1.0
    X111  OBJ  19.0
    X112  R12  1.0
    X112  R137  1.0
    X112  OBJ  13.0
    X113  R13  1.0
    X113  R138  1.0
    X113  OBJ  29.0
    X114  R14  1.0
    X114  R139  1.0
    X114  OBJ  19.0
    X115  R15  1.0
    X115  R140  1.0
    X115  OBJ  2.0
    X116  R16  1.0
    X116  R141  1.0
    X116  OBJ  27.0
    X117  R17  1.0
    X117  R142  1.0
    X117  OBJ  27.0
    X118  R18  1.0
    X118  R143  1.0
    X118  OBJ  8.0
    X119  R19  1.0
    X119  R144  1.0
    X119  OBJ  5.0
    X120  R20  1.0
    X120  R145  1.0
    X120  OBJ  4.0
    X121  R21  1.0
    X121  R146  1.0
    X121  OBJ  20.0
    X122  R22  1.0
    X122  R147  1.0
    X122  OBJ  3.0
    X123  R23  1.0
    X123  R148  1.0
    X123  OBJ  1.0
    X124  R24  1.0
    X124  R149  1.0
    X124  OBJ  10.0
    X125  R0  1.0
    X125  R150  1.0
    X125  OBJ  2.0
    X126  R1  1.0
    X126  R151  1.0
    X126  OBJ  7.0
    X127  R2  1.0
    X127  R152  1.0
    X127  OBJ  4.0
    X128  R3  1.0
    X128  R153  1.0
    X128  OBJ  26.0
    X129  R4  1.0
    X129  R154  1.0
    X129  OBJ  27.0
    X130  R5  1.0
    X130  R155  1.0
    X130  OBJ  5.0
    X131  R6  1.0
    X131  R156  1.0
    X131  OBJ  23.0
    X132  R7  1.0
    X132  R157  1.0
    X132  OBJ  3.0
    X133  R8  1.0
    X133  R158  1.0
    X133  OBJ  20.0
    X134  R9  1.0
    X134  R159  1.0
    X134  OBJ  27.0
    X135  R10  1.0
    X135  R160  1.0
    X135  OBJ  19.0
    X136  R11  1.0
    X136  R161  1.0
    X136  OBJ  7.0
    X137  R12  1.0
    X137  R162  1.0
    X137  OBJ  9.0
    X138  R13  1.0
    X138  R163  1.0
    X138  OBJ  27.0
    X139  R14  1.0
    X139  R164  1.0
    X139  OBJ  16.0
    X140  R15  1.0
    X140  R165  1.0
    X140  OBJ  2.0
    X141  R16  1.0
    X141  R166  1.0
    X141  OBJ  14.0
    X142  R17  1.0
    X142  R167  1.0
    X142  OBJ  15.0
    X143  R18  1.0
    X143  R168  1.0
    X143  OBJ  28.0
    X144  R19  1.0
    X144  R169  1.0
    X144  OBJ  26.0
    X145  R20  1.0
    X145  R170  1.0
    X145  OBJ  14.0
    X146  R21  1.0
    X146  R171  1.0
    X146  OBJ  9.0
    X147  R22  1.0
    X147  R172  1.0
    X147  OBJ  22.0
    X148  R23  1.0
    X148  R173  1.0
    X148  OBJ  27.0
    X149  R24  1.0
    X149  R174  1.0
    X149  OBJ  11.0
    X150  R0  1.0
    X150  R175  1.0
    X150  OBJ  5.0
    X151  R1  1.0
    X151  R176  1.0
    X151  OBJ  27.0
    X152  R2  1.0
    X152  R177  1.0
    X152  OBJ  7.0
    X153  R3  1.0
    X153  R178  1.0
    X153  OBJ  25.0
    X154  R4  1.0
    X154  R179  1.0
    X154  OBJ  28.0
    X155  R5  1.0
    X155  R180  1.0
    X155  OBJ  29.0
    X156  R6  1.0
    X156  R181  1.0
    X156  OBJ  23.0
    X157  R7  1.0
    X157  R182  1.0
    X157  OBJ  7.0
    X158  R8  1.0
    X158  R183  1.0
    X158  OBJ  10.0
    X159  R9  1.0
    X159  R184  1.0
    X159  OBJ  26.0
    X160  R10  1.0
    X160  R185  1.0
    X160  OBJ  10.0
    X161  R11  1.0
    X161  R186  1.0
    X161  OBJ  14.0
    X162  R12  1.0
    X162  R187  1.0
    X162  OBJ  20.0
    X163  R13  1.0
    X163  R188  1.0
    X163  OBJ  15.0
    X164  R14  1.0
    X164  R189  1.0
    X164  OBJ  25.0
    X165  R15  1.0
    X165  R190  1.0
    X165  OBJ  16.0
    X166  R16  1.0
    X166  R191  1.0
    X166  OBJ  18.0
    X167  R17  1.0
    X167  R192  1.0
    X167  OBJ  3.0
    X168  R18  1.0
    X168  R193  1.0
    X168  OBJ  19.0
    X169  R19  1.0
    X169  R194  1.0
    X169  OBJ  26.0
    X170  R20  1.0
    X170  R195  1.0
    X170  OBJ  13.0
    X171  R21  1.0
    X171  R196  1.0
    X171  OBJ  18.0
    X172  R22  1.0
    X172  R197  1.0
    X172  OBJ  9.0
    X173  R23  1.0
    X173  R198  1.0
    X173  OBJ  4.0
    X174  R24  1.0
    X174  R199  1.0
    X174  OBJ  12.0
    X175  R0  1.0
    X175  R200  1.0
    X175  OBJ  22.0
    X176  R1  1.0
    X176  R201  1.0
    X176  OBJ  10.0
    X177  R2  1.0
    X177  R202  1.0
    X177  OBJ  4.0
    X178  R3  1.0
    X178  R203  1.0
    X178  OBJ  9.0
    X179  R4  1.0
    X179  R204  1.0
    X179  OBJ  12.0
    X180  R5  1.0
    X180  R205  1.0
    X180  OBJ  14.0
    X181  R6  1.0
    X181  R206  1.0
    X181  OBJ  20.0
    X182  R7  1.0
    X182  R207  1.0
    X182  OBJ  4.0
    X183  R8  1.0
    X183  R208  1.0
    X183  OBJ  14.0
    X184  R9  1.0
    X184  R209  1.0
    X184  OBJ  23.0
    X185  R10  1.0
    X185  R210  1.0
    X185  OBJ  2.0
    X186  R11  1.0
    X186  R211  1.0
    X186  OBJ  27.0
    X187  R12  1.0
    X187  R212  1.0
    X187  OBJ  19.0
    X188  R13  1.0
    X188  R213  1.0
    X188  OBJ  15.0
    X189  R14  1.0
    X189  R214  1.0
    X189  OBJ  11.0
    X190  R15  1.0
    X190  R215  1.0
    X190  OBJ  14.0
    X191  R16  1.0
    X191  R216  1.0
    X191  OBJ  12.0
    X192  R17  1.0
    X192  R217  1.0
    X192  OBJ  21.0
    X193  R18  1.0
    X193  R218  1.0
    X193  OBJ  5.0
    X194  R19  1.0
    X194  R219  1.0
    X194  OBJ  21.0
    X195  R20  1.0
    X195  R220  1.0
    X195  OBJ  6.0
    X196  R21  1.0
    X196  R221  1.0
    X196  OBJ  28.0
    X197  R22  1.0
    X197  R222  1.0
    X197  OBJ  29.0
    X198  R23  1.0
    X198  R223  1.0
    X198  OBJ  6.0
    X199  R24  1.0
    X199  R224  1.0
    X199  OBJ  18.0
    X200  R25  -1.0
    X200  R26  -1.0
    X200  R27  -1.0
    X200  R28  -1.0
    X200  R29  -1.0
    X200  R30  -1.0
    X200  R31  -1.0
    X200  R32  -1.0
    X200  R33  -1.0
    X200  R34  -1.0
    X200  R35  -1.0
    X200  R36  -1.0
    X200  R37  -1.0
    X200  R38  -1.0
    X200  R39  -1.0
    X200  R40  -1.0
    X200  R41  -1.0
    X200  R42  -1.0
    X200  R43  -1.0
    X200  R44  -1.0
    X200  R45  -1.0
    X200  R46  -1.0
    X200  R47  -1.0
    X200  R48  -1.0
    X200  R49  -1.0
    X200  OBJ  87.0
    X201  R50  -1.0
    X201  R51  -1.0
    X201  R52  -1.0
    X201  R53  -1.0
    X201  R54  -1.0
    X201  R55  -1.0
    X201  R56  -1.0
    X201  R57  -1.0
    X201  R58  -1.0
    X201  R59  -1.0
    X201  R60  -1.0
    X201  R61  -1.0
    X201  R62  -1.0
    X201  R63  -1.0
    X201  R64  -1.0
    X201  R65  -1.0
    X201  R66  -1.0
    X201  R67  -1.0
    X201  R68  -1.0
    X201  R69  -1.0
    X201  R70  -1.0
    X201  R71  -1.0
    X201  R72  -1.0
    X201  R73  -1.0
    X201  R74  -1.0
    X201  OBJ  66.0
    X202  R75  -1.0
    X202  R76  -1.0
    X202  R77  -1.0
    X202  R78  -1.0
    X202  R79  -1.0
    X202  R80  -1.0
    X202  R81  -1.0
    X202  R82  -1.0
    X202  R83  -1.0
    X202  R84  -1.0
    X202  R85  -1.0
    X202  R86  -1.0
    X202  R87  -1.0
    X202  R88  -1.0
    X202  R89  -1.0
    X202  R90  -1.0
    X202  R91  -1.0
    X202  R92  -1.0
    X202  R93  -1.0
    X202  R94  -1.0
    X202  R95  -1.0
    X202  R96  -1.0
    X202  R97  -1.0
    X202  R98  -1.0
    X202  R99  -1.0
    X202  OBJ  69.0
    X203  R100  -1.0
    X203  R101  -1.0
    X203  R102  -1.0
    X203  R103  -1.0
    X203  R104  -1.0
    X203  R105  -1.0
    X203  R106  -1.0
    X203  R107  -1.0
    X203  R108  -1.0
    X203  R109  -1.0
    X203  R110  -1.0
    X203  R111  -1.0
    X203  R112  -1.0
    X203  R113  -1.0
    X203  R114  -1.0
    X203  R115  -1.0
    X203  R116  -1.0
    X203  R117  -1.0
    X203  R118  -1.0
    X203  R119  -1.0
    X203  R120  -1.0
    X203  R121  -1.0
    X203  R122  -1.0
    X203  R123  -1.0
    X203  R124  -1.0
    X203  OBJ  82.0
    X204  R125  -1.0
    X204  R126  -1.0
    X204  R127  -1.0
    X204  R128  -1.0
    X204  R129  -1.0
    X204  R130  -1.0
    X204  R131  -1.0
    X204  R132  -1.0
    X204  R133  -1.0
    X204  R134  -1.0
    X204  R135  -1.0
    X204  R136  -1.0
    X204  R137  -1.0
    X204  R138  -1.0
    X204  R139  -1.0
    X204  R140  -1.0
    X204  R141  -1.0
    X204  R142  -1.0
    X204  R143  -1.0
    X204  R144  -1.0
    X204  R145  -1.0
    X204  R146  -1.0
    X204  R147  -1.0
    X204  R148  -1.0
    X204  R149  -1.0
    X204  OBJ  24.0
    X205  R150  -1.0
    X205  R151  -1.0
    X205  R152  -1.0
    X205  R153  -1.0
    X205  R154  -1.0
    X205  R155  -1.0
    X205  R156  -1.0
    X205  R157  -1.0
    X205  R158  -1.0
    X205  R159  -1.0
    X205  R160  -1.0
    X205  R161  -1.0
    X205  R162  -1.0
    X205  R163  -1.0
    X205  R164  -1.0
    X205  R165  -1.0
    X205  R166  -1.0
    X205  R167  -1.0
    X205  R168  -1.0
    X205  R169  -1.0
    X205  R170  -1.0
    X205  R171  -1.0
    X205  R172  -1.0
    X205  R173  -1.0
    X205  R174  -1.0
    X205  OBJ  50.0
    X206  R175  -1.0
    X206  R176  -1.0
    X206  R177  -1.0
    X206  R178  -1.0
    X206  R179  -1.0
    X206  R180  -1.0
    X206  R181  -1.0
    X206  R182  -1.0
    X206  R183  -1.0
    X206  R184  -1.0
    X206  R185  -1.0
    X206  R186  -1.0
    X206  R187  -1.0
    X206  R188  -1.0
    X206  R189  -1.0
    X206  R190  -1.0
    X206  R191  -1.0
    X206  R192  -1.0
    X206  R193  -1.0
    X206  R194  -1.0
    X206  R195  -1.0
    X206  R196  -1.0
    X206  R197  -1.0
    X206  R198  -1.0
    X206  R199  -1.0
    X206  OBJ  23.0
    X207  R200  -1.0
    X207  R201  -1.0
    X207  R202  -1.0
    X207  R203  -1.0
    X207  R204  -1.0
    X207  R205  -1.0
    X207  R206  -1.0
    X207  R207  -1.0
    X207  R208  -1.0
    X207  R209  -1.0
    X207  R210  -1.0
    X207  R211  -1.0
    X207  R212  -1.0
    X207  R213  -1.0
    X207  R214  -1.0
    X207  R215  -1.0
    X207  R216  -1.0
    X207  R217  -1.0
    X207  R218  -1.0
    X207  R219  -1.0
    X207  R220  -1.0
    X207  R221  -1.0
    X207  R222  -1.0
    X207  R223  -1.0
    X207  R224  -1.0
    X207  OBJ  32.0
RHS
    RHS  R0  1.0
    RHS  R1  1.0
    RHS  R2  1.0
    RHS  R3  1.0
    RHS  R4  1.0
    RHS  R5  1.0
    RHS  R6  1.0
    RHS  R7  1.0
    RHS  R8  1.0
    RHS  R9  1.0
    RHS  R10  1.0
    RHS  R11  1.0
    RHS  R12  1.0
    RHS  R13  1.0
    RHS  R14  1.0
    RHS  R15  1.0
    RHS  R16  1.0
    RHS  R17  1.0
    RHS  R18  1.0
    RHS  R19  1.0
    RHS  R20  1.0
    RHS  R21  1.0
    RHS  R22  1.0
    RHS  R23  1.0
    RHS  R24  1.0
BOUNDS
 UP BND  X0  1.0
 UP BND  X1  1.0
 UP BND  X2  1.0
 UP BND  X3  1.0
 UP BND  X4  1.0
 UP BND  X5  1.0
 UP BND  X6  1.0
 UP BND  X7  1.0
 UP BND  X8  1.0
 UP BND  X9  1.0
 UP BND  X10  1.0
 UP BND  X11  1.0
 UP BND  X12  1.0
 UP BND  X13  1.0
 UP BND  X14  1.0
 UP BND  X15  1.0
 UP BND  X16  1.0
 UP BND  X17  1.0
 UP BND  X18  1.0
 UP BND  X19  1.0
 UP BND  X20  1.0
 UP BND  X21  1.0
 UP BND  X22  1.0
 UP BND  X23  1.0
 UP BND  X24  1.0
 UP BND  X25  1.0
 UP BND  X26  1.0
 UP BND  X27  1.0
 UP BND  X28  1.0
 UP BND  X29  1.0
 UP BND  X30  1.0
 UP BND  X31  1.0
 UP BND  X32  1.0
 UP BND  X33  1.0
 UP BND  X34  1.0
 UP BND  X35  1.0
 UP BND  X36  1.0
 UP BND  X37  1.0
 UP BND  X38  1.0
 UP BND  X39  1.0
 UP BND  X40  1.0
 UP BND  X41  1.0
 UP BND  X42  1.0
 UP BND  X43  1.0
 UP BND  X44  1.0
 UP BND  X45  1.0
 UP BND  X46  1.0
 UP BND  X47  1.0
 UP BND  X48  1.0
 UP BND  X49  1.0
 UP BND  X50  1.0
 UP BND  X51  1.0
 UP BND  X52  1.0
 UP BND  X53  1.0
 UP BND  X54  1.0
 UP BND  X55  1.0
 UP BND  X56  1.0
 UP BND  X57  1.0
 UP BND  X58  1.0
 UP BND  X59  1.0
 UP BND  X60  1.0
 UP BND  X61  1.0
 UP BND  X62  1.0
 UP BND  X63  1.0
 UP BND  X64  1.0
 UP BND  X65  1.0
 UP BND  X66  1.0
 UP BND  X67  1.0
 UP BND  X68  1.0
 UP BND  X69  1.0
 UP BND  X70  1.0
 UP BND  X71  1.0
 UP BND  X72  1.0
 UP BND  X73  1.0
 UP BND  X74  1.0
 UP BND  X75  1.0
 UP BND  X76  1.0
 UP BND  X77  1.0
 UP BND  X78  1.0
 UP BND  X79  1.0
 UP BND  X80  1.0
 UP BND  X81  1.0
 UP BND  X82  1.0
 UP BND  X83  1.0
 UP BND  X84  1.0
 UP BND  X85  1.0
 UP BND  X86  1.0
 UP BND  X87  1.0
 UP BND  X88  1.0
 UP BND  X89  1.0
 UP BND  X90  1.0
 UP BND  X91  1.0
 UP BND  X92  1.0
 UP BND  X93  1.0
 UP BND  X94  1.0
 UP BND  X95  1.0
 UP BND  X96  1.0
 UP BND  X97  1.0
 UP BND  X98  1.0
 UP BND  X99  1.0
 UP BND  X100  1.0
 UP BND  X101  1.0
 UP BND  X102  1.0
 UP BND  X103  1.0
 UP BND  X104  1.0
 UP BND  X105  1.0
 UP BND  X106  1.0
 UP BND  X107  1.0
 UP BND  X108  1.0
 UP BND  X109  1.0
 UP BND  X110  1.0
 UP BND  X111  1.0
 UP BND  X112  1.0
 UP BND  X113  1.0
 UP BND  X114  1.0
 UP BND  X115  1.0
 UP BND  X116  1.0
 UP BND  X117  1.0
 UP BND  X118  1.0
 UP BND  X119  1.0
 UP BND  X120  1.0
 UP BND  X121  1.0
 UP BND  X122  1.0
 UP BND  X123  1.0
 UP BND  X124  1.0
 UP BND  X125  1.0
 UP BND  X126  1.0
 UP BND  X127  1.0
 UP BND  X128  1.0
 UP BND  X129  1.0
 UP BND  X130  1.0
 UP BND  X131  1.0
 UP BND  X132  1.0
 UP BND  X133  1.0
 UP BND  X134  1.0
 UP BND  X135  1.0
 UP BND  X136  1.0
 UP BND  X137  1.0
 UP BND  X138  1.0
 UP BND  X139  1.0
 UP BND  X140  1.0
 UP BND  X141  1.0
 UP BND  X142  1.0
 UP BND  X143  1.0
 UP BND  X144  1.0
 UP BND  X145  1.0
 UP BND  X146  1.0
 UP BND  X147  1.0
 UP BND  X148  1.0
 UP BND  X149  1.0
 UP BND  X150  1.0
 UP BND  X151  1.0
 UP BND  X152  1.0
 UP BND  X153  1.0
 UP BND  X154  1.0
 UP BND  X155  1.0
 UP BND  X156  1.0
 UP BND  X157  1.0
 UP BND  X158  1.0
 UP BND  X159  1.0
 UP BND  X160  1.0
 UP BND  X161  1.0
 UP BND  X162  1.0
 UP BND  X163  1.0
 UP BND  X164  1.0
 UP BND  X165  1.0
 UP BND  X166  1.0
 UP BND  X167  1.0
 UP BND  X168  1.0
 UP BND  X169  1.0
 UP BND  X170  1.0
 UP BND  X171  1.0
 UP BND  X172  1.0
 UP BND  X173  1.0
 UP BND  X174  1.0
 UP BND  X175  1.0
 UP BND  X176  1.0
 UP BND  X177  1.0
 UP BND  X178  1.0
 UP BND  X179  1.0
 UP BND  X180  1.0
 UP BND  X181  1.0
 UP BND  X182  1.0
 UP BND  X183  1.0
 UP BND  X184  1.0
 UP BND  X185  1.0
 UP BND  X186  1.0
 UP BND  X187  1.0
 UP BND  X188  1.0
 UP BND  X189  1.0
 UP BND  X190  1.0
 UP BND  X191  1.0
 UP BND  X192  1.0
 UP BND  X193  1.0
 UP BND  X194  1.0
 UP BND  X195  1.0
 UP BND  X196  1.0
 UP BND  X197  1.0
 UP BND  X198  1.0
 UP BND  X199  1.0
 UP BND  X200  1.0
 UP BND  X201  1.0
 UP BND  X202  1.0
 UP BND  X203  1.0
 UP BND  X204  1.0
 UP BND  X205  1.0
 UP BND  X206  1.0
 UP BND  X207  1.0
ENDATA
